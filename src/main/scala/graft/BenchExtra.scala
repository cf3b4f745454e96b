package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Extra benchmarks and per-piece diagnostics (guide §1.4: noop-sink
  * isolation) — NOT part of the frozen driver contract in [[Bench]].
  *
  * `runMain graft.BenchExtra <sfDir> <probe> [args...]`; each probe
  * prints labelled wall seconds for the pieces of one heavy query so
  * optimization targets the measured stage, not a guess. */
object BenchExtra {

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "16m")
    // same tmpfs shuffle dir as Bench — disk-backed /tmp adds tens of
    // percent of variance to shuffle-heavy probes
    if (new java.io.File("/dev/shm").isDirectory)
      b.config("spark.local.dir", "/dev/shm/graft-spark-local")
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def timed[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[extra] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val probe = if (args.length > 1) args(1) else "q75"
    val spark = session()
    spark.read.parquet(s"$sfDir/documents.parquet").count() // warm-up
    probe match {
      case "q75" => q75Pieces(spark, sfDir)
      case "q122" => q122Pieces(spark, sfDir)
      case "q164" => q164Pieces(spark, sfDir)
      case "q160" => q160Pieces(spark, sfDir)
      case "q153" => q153Pieces(spark, sfDir)
      case "q89" => q89Pieces(spark, sfDir)
      case "q61cache" =>
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        (1 to 2).foreach { r =>
          timed(s"clusters r$r") {
            noop(graft.dedup.Dedup.clusters(spark, docs, 0.5,
              portableHash = true))
          }
        }
      case "explain" =>
        // dump explain("formatted") for named queries:
        //   runMain graft.BenchExtra <sfDir> explain <outDir> <suffix> <q>...
        val outDir = args(2); val suffix = args(3)
        new java.io.File(outDir).mkdirs()
        args.drop(4).foreach { name =>
          val df = SparkEntry.queries(name)(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
            Explain.normalize(plan))
          println(s"[extra] wrote $outDir/${name}_$suffix.txt")
        }
      case "noop" =>
        // noop-sink isolation for any named query (full column compute)
        args.drop(2).foreach { name =>
          val t0 = System.nanoTime()
          noop(SparkEntry.queries(name)(spark, sfDir))
          println(f"[extra] noop $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
      case other => sys.error(s"unknown probe $other")
    }
    spark.stop()
  }

  /** q153 piece-by-piece: sccEdges derivation, Scc.run labels, the
    * condensation, the doubling closure, the expansion joins. */
  private def q153Pieces(spark: SparkSession, dir: String): Unit = {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_partkey")
      .filter(col("l_partkey") % 5 === 0)
    val pairs0 = li.as("a")
      .join(li.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
    val pairs = timed("mod5 pairs derive+checkpoint") { pairs0.localCheckpoint() }
    println(s"[extra] |pairs| = ${pairs.count()}")
    val h = graft.core.Buckets.md5Bucket(concat_ws("|", col("u"), col("v")), 10)
    val edges = pairs.filter(h < 2).select(
      when(h % 2 === 0, col("u")).otherwise(col("v")).as("src"),
      when(h % 2 === 0, col("v")).otherwise(col("u")).as("dst"))
    println(s"[extra] |edges| = ${edges.count()}")
    val labels = timed("Scc.run") {
      val l = graft.kg.Scc.run(spark, edges).localCheckpoint(); l.count(); l
    }
    println(s"[extra] |labels| = ${labels.count()}")
    val e = edges.select("src", "dst").filter(col("src") =!= col("dst"))
      .distinct()
    val cond = timed("condensation agg") {
      val c = e.join(labels.withColumnRenamed("node", "src")
          .withColumnRenamed("scc", "csrc"), "src")
        .join(labels.withColumnRenamed("node", "dst")
          .withColumnRenamed("scc", "cdst"), "dst")
        .filter(col("csrc") =!= col("cdst"))
        .groupBy("csrc", "cdst").agg(count(lit(1)).as("n_edges"))
        .select(col("csrc").as("src"), col("cdst").as("dst"))
        .localCheckpoint()
      c.count(); c
    }
    println(s"[extra] |cond| = ${cond.count()}")
    val cc = timed("closureFixpoint (doubling)") {
      val c = graft.kg.TriplePatterns.closureFixpoint(cond).localCheckpoint()
      c.count(); c
    }
    println(s"[extra] |closure| = ${cc.count()}")
    timed("expansion joins -> noop") {
      val ccr = cc.select(col("src").as("cs"), col("dst").as("cd"))
      val sizes = labels.groupBy("scc").agg(count(lit(1)).as("sz"))
      val multi = labels.join(sizes.filter(col("sz") >= 2).select("scc"), "scc")
      val intra = multi.as("a").join(multi.as("b"), "scc")
        .select(col("a.node").as("src"), col("b.node").as("dst"))
      val inter = labels.select(col("node").as("src"), col("scc").as("cs"))
        .join(ccr, "cs")
        .join(labels.select(col("node").as("dst"), col("scc").as("cd")), "cd")
        .select("src", "dst")
      noop(intra.unionByName(inter))
    }
  }

  /** q89: one label-prop round via rank-1 window vs arg-max aggregate. */
  private def q89Pieces(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_partkey")
    val pairs = li.as("a")
      .join(li.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
    val canon = graft.kg.Triangles.canonicalEdges(pairs, "u", "v")
      .localCheckpoint()
    val und = canon.select(col("u").as("w"), col("v").as("n"))
      .union(canon.select(col("v").as("w"), col("u").as("n")))
      .localCheckpoint()
    println(s"[extra] |und| = ${und.count()}")
    val labels0 = und.select(col("w").as("node")).distinct()
      .withColumn("label", col("node")).localCheckpoint()
    val byVotes = Window.partitionBy("node")
      .orderBy(col("votes").desc, col("label").asc)
    (1 to 2).foreach { r =>
      timed(s"round via window r$r") {
        noop(und.join(labels0, und("n") === labels0("node"))
          .select(col("w").as("node"), col("label"))
          .groupBy("node", "label").agg(count(lit(1)).as("votes"))
          .withColumn("rn", row_number().over(byVotes))
          .filter(col("rn") === 1)
          .select(col("node"), col("label")))
      }
      timed(s"round via argmax agg r$r") {
        noop(und.join(labels0, und("n") === labels0("node"))
          .select(col("w").as("node"), col("label"))
          .groupBy("node", "label").agg(count(lit(1)).as("votes"))
          .groupBy("node")
          .agg(max(struct(col("votes"), (-col("label")).as("nl"))).as("m"))
          .select(col("node"), (-col("m.nl")).as("label")))
      }
    }
  }

  /** q160 piece-by-piece: token sets, df, prefix, candidate join,
    * intersection verification. */
  private def q160Pieces(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val items = graft.dedup.Decontam.gramFingerprints(docs, 3)
      .select(col("doc_id"), col("gh").as("item"))
    val tMicro = 500000L
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val toks = items.select(col("doc_id"), col("item").as("tok")).distinct()
      .persist(lvl)
    println(s"[extra] |toks| = ${toks.count()}")
    val df = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    val lens = toks.groupBy("doc_id").agg(count(lit(1)).as("len"))
    val prefLen =
      expr(s"len - (len * ${tMicro}L + 999999L) DIV 1000000L + 1L")
    val byRarity = Window.partitionBy("doc_id")
      .orderBy(col("df").asc, col("tok").asc)
    val prefix = timed("prefix rows (join+window+checkpoint)") {
      toks.join(df, "tok").join(lens, "doc_id")
        .withColumn("rn", row_number().over(byRarity))
        .filter(col("rn") <= prefLen)
        .select("doc_id", "tok").localCheckpoint()
    }
    println(s"[extra] |prefix| = ${prefix.count()}")
    val cand = timed("candidate join+distinct+checkpoint") {
      prefix.as("a").join(prefix.as("b"),
          col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct().localCheckpoint()
    }
    println(s"[extra] |cand| = ${cand.count()}")
    timed("verify via double token join") {
      noop(cand
        .join(toks.select(col("doc_id").as("doc_a"), col("tok")), "doc_a")
        .join(toks.select(col("doc_id").as("doc_b"), col("tok")),
          Seq("doc_b", "tok"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter")))
    }
    timed("verify via sorted-array intersection") {
      val arrs = toks.groupBy("doc_id")
        .agg(sort_array(collect_list(col("tok"))).as("ts"))
      noop(cand
        .join(arrs.select(col("doc_id").as("doc_a"), col("ts").as("ta")),
          "doc_a")
        .join(arrs.select(col("doc_id").as("doc_b"), col("ts").as("tb")),
          "doc_b")
        .select(col("doc_a"), col("doc_b"),
          size(array_intersect(col("ta"), col("tb"))).as("inter")))
    }
  }

  /** q164 piece-by-piece: variant explode, candidate join, distinct,
    * verify — plus hash-keyed and filter-before-distinct variants. */
  private def q164Pieces(spark: SparkSession, dir: String): Unit = {
    val names = spark.read.parquet(s"$dir/customer.parquet")
    val n = names.select(col("c_name").as("name")).distinct()
    def v = n.select(col("name"), explode(array_distinct(concat(
        array(col("name")),
        expr("""transform(sequence(1, length(name)),
          i -> concat(substring(name, 1, i - 1),
                      substring(name, i + 1, length(name))))""")))))
      .toDF("name", "vr")
    println(s"[extra] |names| = ${n.count()}, |variants| = ${v.count()}")
    (1 to 2).foreach { r =>
      timed(s"candidates join+count r$r") {
        println("[extra]   cand rows = " + v.as("x").join(v.as("y"),
          col("x.vr") === col("y.vr") && col("x.name") < col("y.name")).count())
      }
      timed(s"current full (distinct then lev) r$r") {
        noop(v.as("x").join(v.as("y"),
            col("x.vr") === col("y.vr") && col("x.name") < col("y.name"))
          .select(col("x.name").as("a"), col("y.name").as("b"))
          .distinct()
          .withColumn("dist", levenshtein(col("a"), col("b")).cast("long"))
          .filter(col("dist") <= 1))
      }
      val cand = v.as("x").join(v.as("y"),
          col("x.vr") === col("y.vr") && col("x.name") < col("y.name"))
        .select(col("x.name").as("a"), col("y.name").as("b"))
      timed(s"join -> distinct -> count r$r") {
        println("[extra]   distinct rows = " + cand.distinct().count())
      }
      timed(s"join -> lev+filter -> count r$r") {
        println("[extra]   lev<=1 rows = " + cand
          .withColumn("dist", levenshtein(col("a"), col("b")).cast("long"))
          .filter(col("dist") <= 1).count())
      }
      timed(s"join -> distinct -> lev noop r$r") {
        noop(cand.distinct()
          .withColumn("dist", levenshtein(col("a"), col("b")).cast("long"))
          .filter(col("dist") <= 1))
      }
    }
  }

  /** q122 piece-by-piece: the holdout split, candidates on the train
    * graph, then the rank window + holdout join. */
  private def q122Pieces(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_partkey")
    val pairs = li.as("a")
      .join(li.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
    val canon = timed("canonical edges (derive+checkpoint)") {
      graft.kg.Triangles.canonicalEdges(pairs, "u", "v").localCheckpoint()
    }
    val cap = graft.kg.LinkPredict.measuredHubCap(canon, 0.75)
    println(s"[extra] cap = $cap")
    (1 to 2).foreach { round =>
      val keyed = canon.withColumn("hb",
        graft.core.Buckets.md5Bucket(
          concat(col("u").cast("string"), lit(":"), col("v").cast("string")),
          10))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val held = keyed.filter(col("hb") === 0).select("u", "v")
      val train = keyed.filter(col("hb") =!= 0).select("u", "v")
      val cand = timed(s"candidates(train) r$round") {
        val c = graft.kg.LinkPredict.candidates(train, cap, 16L)
          .localCheckpoint()
        c.count(); c
      }
      val ranked = cand.withColumn("r", row_number().over(
        Window.partitionBy("e1").orderBy(desc("n_common"), asc("e2")))
        .cast("long"))
      timed(s"rank+join+agg r$round") {
        noop(held
          .join(ranked.select(col("e1").as("u"), col("e2").as("v"), col("r")),
            Seq("u", "v"), "left")
          .agg(count(lit(1)).as("n_holdout"), count(col("r")).as("n_ranked")))
      }
      keyed.unpersist()
    }
  }

  /** q75 piece-by-piece: edge derivation, degrees, capped adjacency,
    * wedge enumeration row count, and the count aggregation. */
  private def q75Pieces(spark: SparkSession, dir: String): Unit = {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_partkey")
    val pairs = li.as("a")
      .join(li.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
    val canon = timed("canonical edges (derive+checkpoint)") {
      graft.kg.Triangles.canonicalEdges(pairs, "u", "v").localCheckpoint()
    }
    println(s"[extra] |E| = ${canon.count()}")
    val cap = timed("measuredHubCap") {
      graft.kg.LinkPredict.measuredHubCap(canon, 0.75)
    }
    println(s"[extra] cap = $cap")
    val und = canon.select(col("u").as("w"), col("v").as("n"))
      .union(canon.select(col("v").as("w"), col("u").as("n")))
    val deg = timed("degrees (agg+checkpoint)") {
      und.groupBy("w").agg(count(lit(1)).as("d")).localCheckpoint()
    }
    println(s"[extra] |V| = ${deg.count()}, maxDeg = " +
      deg.agg(max("d")).head().getLong(0))
    val capped = timed("capped adjacency (join+checkpoint)") {
      und.join(deg.filter(col("d") <= cap), "w").localCheckpoint()
    }
    println(s"[extra] |capped adj| = ${capped.count()}")
    val lists = capped.groupBy(col("w"), col("d"))
      .agg(sort_array(collect_set(col("n"))).as("ns"))
      .repartition(spark.sessionState.conf.numShufflePartitions)
    val wedges = lists
      .select(posexplode(col("ns")).as(Seq("i", "e1")), col("ns"))
      .select(col("e1"),
        explode(slice(col("ns"), col("i") + 2, size(col("ns")))).as("e2"))
    timed("wedge enumeration -> noop") { noop(wedges) }
    println(s"[extra] |wedges| = " + timed("wedge count (agg-free)") {
      wedges.count()
    })
    val fanout = deg.filter(col("d") <= cap)
      .agg(sum(col("d") * (col("d") - 1))).head().getLong(0) / 2
    val npartsC = math.max(32, (fanout / 250000L).toInt)
    println(s"[extra] fanout = $fanout -> npartsC = $npartsC")
    def wedgesAt(nparts: Int) = capped.groupBy(col("w"), col("d"))
      .agg(sort_array(collect_set(col("n"))).as("ns"))
      .repartition(nparts)
      .select(posexplode(col("ns")).as(Seq("i", "e1")), col("ns"))
      .select(col("e1"),
        explode(slice(col("ns"), col("i") + 2, size(col("ns")))).as("e2"))
    def run2col(nparts: Int): Unit = {
      val c = timed(s"phase-1 count ($nparts tasks, 2-col key)") {
        wedgesAt(nparts).groupBy("e1", "e2").agg(count(lit(1)).as("n_common"))
          .filter(col("n_common") >= 16L).localCheckpoint()
      }
      println(s"[extra]   -> ${c.count()} rows")
    }
    def runPacked(nparts: Int): Unit = {
      val c = timed(s"phase-1 count ($nparts tasks, packed key)") {
        wedgesAt(nparts)
          .select((col("e1") * 4294967296L + col("e2")).as("pk"))
          .groupBy("pk").agg(count(lit(1)).as("n_common"))
          .filter(col("n_common") >= 16L)
          .select((col("pk") / 4294967296L).cast("long").as("e1"),
            pmod(col("pk"), lit(4294967296L)).as("e2"), col("n_common"))
          .localCheckpoint()
      }
      println(s"[extra]   -> ${c.count()} rows")
    }
    (1 to 2).foreach { _ =>
      run2col(32); runPacked(32); run2col(npartsC); runPacked(npartsC)
    }
  }
}
