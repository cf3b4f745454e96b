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
