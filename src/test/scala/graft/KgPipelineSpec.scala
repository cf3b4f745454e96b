package graft

import graft.fixtures.WebTextGen
import graft.kg.KgPipeline
import graft.ner.NerSpark
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** End-to-end tests of the north-rule pipeline: gold parity (P/R = 1.0 on
  * planted mentions), canonicalization, and byte-stable resume from
  * per-bucket checkpoints. */
class KgPipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-kg-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshDir(): String =
    Files.createTempDirectory("graft-kg-").toString

  test("generator is deterministic and plants dictionary surfaces") {
    val p1 = WebTextGen.page(123L)
    val p2 = WebTextGen.page(123L)
    assert(p1.url == p2.url && p1.text == p2.text && p1.warc_ts == p2.warc_ts)
    assert(java.util.Arrays.equals(p1.html, p2.html))
    // over 200 docs the dict surfaces occur
    val texts = (0L until 200L).map(WebTextGen.page(_).text)
    assert(texts.exists(_.contains("spark")))
    assert(texts.exists(_.contains("hash join")))
  }

  test("pipeline: html verify, P/R=1.0 vs planted gold, canonical triples") {
    import spark.implicits._
    val out = freshDir()
    val pages = WebTextGen.pages(spark, 200, 4)
    val stats = KgPipeline.run(spark, pages.toDF(), KgPipeline.Config(out, numBuckets = 8))

    assert(stats.docs == 200)
    assert(stats.htmlMismatches == 0)
    assert(stats.bucketsProcessed == 8)
    assert(stats.triples > 0)

    // gold parity: pipeline mentions == WebTextGen.gold per document → the
    // evaluator must report perfect micro metrics (north target P/R ≥ 0.95)
    val docs = pages.toDF().select(col("url").as("doc_id"), col("text"))
      .withColumn("doc_id", xxhash64(col("doc_id"))) // numeric doc key
    val goldDf = pages.flatMap { p =>
      WebTextGen.gold(p.text).map { case (c, s, b, e) => (p.url, c, s, b, e) }
    }.toDF("url", "category", "surface", "begin_c", "end_c")
      .withColumn("doc_id", xxhash64(col("url"))).drop("url")
    val predDf = NerSpark.mentions(spark,
      pages.toDF().select(xxhash64(col("url")).as("doc_id"), col("text")))
    val micro = NerSpark.microMetrics(spark, docs, goldDf, predDf).head()
    assert(micro.getAs[Double]("precision") == 1.0)
    assert(micro.getAs[Double]("recall") == 1.0)

    // canonicalization: duplicate-alias entities collapse to one component
    val triples = spark.read.parquet(s"$out/triples")
    val subjects = triples.select("subj").distinct().as[String].collect().toSet
    assert(!subjects.contains("ent:spark") || !subjects.contains("ent:apache_spark"),
      "spark duplicates must be canonicalized to a single id")

    // lineage/metrics table: one row per bucket
    val metrics = spark.read.parquet(s"$out/metrics")
    assert(metrics.select("bucket").distinct().count() == 8)
    assert(metrics.columns.toSet ==
      Set("bucket", "docs", "html_mismatches", "mentions", "failed_batches",
        "docs_filtered", "triples", "run_id", "wall_ms"))
  }

  test("quality gate: failing docs keep lineage rows but never reach linking") {
    import spark.implicits._
    val out = freshDir()
    val pages = WebTextGen.pages(spark, 200, 4).toDF()
    // allow only English — es/it docs must be filtered, with lineage
    val st = KgPipeline.run(spark, pages,
      KgPipeline.Config(out, numBuckets = 8, langAllowed = Some(Set("en"))))
    val docs = spark.read.parquet(s"$out/docs")
    val nEs = docs.filter(col("lang") =!= "en").count()
    assert(st.docsFiltered == nEs && nEs > 0)
    assert(st.docs == 200) // lineage preserved: filtered rows still counted
    assert(docs.filter(col("filtered")).agg(sum("n_mentions")).head().getLong(0) == 0)
    // triples come only from English docs — equal to running on the
    // pre-filtered input
    val outRef = freshDir()
    KgPipeline.run(spark, pages.filter(col("lang") === "en"),
      KgPipeline.Config(outRef, numBuckets = 8))
    val a = spark.read.parquet(s"$out/triples").select("subj", "pred", "obj")
      .as[(String, String, String)].collect().toSet
    val b = spark.read.parquet(s"$outRef/triples").select("subj", "pred", "obj")
      .as[(String, String, String)].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("resume: second run only processes missing buckets, output byte-stable") {
    import spark.implicits._
    val outPartial = freshDir()
    val outFull = freshDir()
    val pages = WebTextGen.pages(spark, 300, 4).toDF()
    val cfg = KgPipeline.Config(outPartial, numBuckets = 8)

    // one-shot reference run
    KgPipeline.run(spark, pages, KgPipeline.Config(outFull, numBuckets = 8))

    // interrupted first run: only buckets 0-4 were given
    val firstInput = pages.filter(KgPipeline.bucketCol(8) <= 4)
    val s1 = KgPipeline.run(spark, firstInput, cfg)
    assert(s1.bucketsProcessed == 5)

    // resume with the FULL input: completed buckets must be skipped
    val s2 = KgPipeline.run(spark, pages, cfg)
    assert(s2.bucketsProcessed == 3, s"expected 3 remaining buckets, got ${s2.bucketsProcessed}")

    // third run: nothing left to do
    val s3 = KgPipeline.run(spark, pages, cfg)
    assert(s3.bucketsProcessed == 0 && s3.triples == 0)

    // resumed output equals the one-shot run exactly
    val a = spark.read.parquet(s"$outPartial/triples")
      .select("subj", "pred", "obj").as[(String, String, String)]
      .collect().toSet
    val b = spark.read.parquet(s"$outFull/triples")
      .select("subj", "pred", "obj").as[(String, String, String)]
      .collect().toSet
    assert(a == b)

    // lineage: two distinct run_ids across the resumed buckets
    val runs = spark.read.parquet(s"$outPartial/metrics")
      .select("run_id").distinct().count()
    assert(runs == 2)
  }

  test("table maintenance composes with resume: compacting outputs mid-stream stays byte-stable") {
    import spark.implicits._
    val out = freshDir()
    val outRef = freshDir()
    val pages = WebTextGen.pages(spark, 300, 4).toDF()
    val cfg = KgPipeline.Config(out, numBuckets = 8)
    KgPipeline.run(spark, pages, KgPipeline.Config(outRef, numBuckets = 8))

    // interrupted run commits buckets 0-4, then the scheduled maintenance
    // job compacts the partitioned outputs (the OPTIMIZE-between-runs
    // reality of a continuously-appending pipeline)
    KgPipeline.run(spark, pages.filter(KgPipeline.bucketCol(8) <= 4), cfg)
    val tStats = graft.sinks.Compact.rewritePartitioned(spark, s"$out/triples")
    val dStats = graft.sinks.Compact.rewritePartitioned(spark, s"$out/docs")
    assert(tStats.nonEmpty && dStats.nonEmpty)

    // resume over compacted state: only the missing buckets run, and the
    // final triples equal the uninterrupted reference run exactly
    val s2 = KgPipeline.run(spark, pages, cfg)
    assert(s2.bucketsProcessed == 3, s"expected 3 remaining buckets, got ${s2.bucketsProcessed}")
    val s3 = KgPipeline.run(spark, pages, cfg)
    assert(s3.bucketsProcessed == 0)
    val a = spark.read.parquet(s"$out/triples")
      .select("subj", "pred", "obj").as[(String, String, String)].collect().toSet
    val b = spark.read.parquet(s"$outRef/triples")
      .select("subj", "pred", "obj").as[(String, String, String)].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("bucketed/aligned input (Iceberg bucket-transform layout) gives the same triples") {
    import spark.implicits._
    val outA = freshDir()
    val outB = freshDir()
    val n = 300L
    // default path: hash-bucketed
    KgPipeline.run(spark, WebTextGen.pages(spark, n, 4).toDF(),
      KgPipeline.Config(outA, numBuckets = 8))
    // aligned path: bucket column from the input, no docs-stage shuffle
    KgPipeline.run(spark, WebTextGen.pagesBucketed(spark, n, 8),
      KgPipeline.Config(outB, numBuckets = 8,
        useInputBucketColumn = true, alignedInput = true))
    def tset(out: String) = spark.read.parquet(s"$out/triples")
      .select("subj", "pred", "obj").as[(String, String, String)]
      .collect().toSet
    // bucket assignment differs (hash vs block), but the TRIPLES are identical
    assert(tset(outA) == tset(outB))
    // resume works in aligned mode too
    val s = KgPipeline.run(spark, WebTextGen.pagesBucketed(spark, n, 8),
      KgPipeline.Config(outB, numBuckets = 8,
        useInputBucketColumn = true, alignedInput = true))
    assert(s.bucketsProcessed == 0)
  }

  test("crash-mid-run repair: bucket with data but no metrics row is rewritten") {
    import spark.implicits._
    val out = freshDir()
    val pages = WebTextGen.pages(spark, 300, 4).toDF()
    val cfg = KgPipeline.Config(out, numBuckets = 8)
    KgPipeline.run(spark, pages, cfg)
    val before = spark.read.parquet(s"$out/triples")
      .select("subj", "pred", "obj").as[(String, String, String)].collect().toSet

    // simulate a crash AFTER the docs/triples write of buckets 2 and 5 but
    // BEFORE their metrics commit: drop their metrics rows and corrupt
    // their triples partitions
    val kept = spark.read.parquet(s"$out/metrics")
      .filter(!col("bucket").isin(2, 5))
      .collect()
    val schema = spark.read.parquet(s"$out/metrics").schema
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$out/metrics"))
    spark.createDataFrame(java.util.Arrays.asList(kept: _*), schema)
      .coalesce(1).write.parquet(s"$out/metrics")
    Seq(2, 5).foreach { b =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$out/triples/bucket=$b"))
    }

    // re-run: only the two uncommitted buckets are reprocessed, and the
    // final output is byte-identical to the uninterrupted run
    val s2 = KgPipeline.run(spark, pages, cfg)
    assert(s2.bucketsProcessed == 2)
    val after = spark.read.parquet(s"$out/triples")
      .select("subj", "pred", "obj").as[(String, String, String)].collect().toSet
    assert(after == before)
  }

  test("dedupExact drops clone pages and matches the pre-deduped run") {
    import spark.implicits._
    val originals = (0L until 100L).map(WebTextGen.page(_))
    // 40 exact clones: same html/text/lang under new (lexically larger) urls
    val clones = originals.take(40).zipWithIndex.map { case (p, i) =>
      p.copy(url = s"https://zz-mirror.example/copy/$i")
    }
    val full = spark.createDataset(scala.util.Random.shuffle(originals ++ clones)).toDF()
    val unique = spark.createDataset(originals).toDF()

    def triples(df: org.apache.spark.sql.DataFrame, dedup: Boolean): (Set[(String, String, String)], KgPipeline.RunStats) = {
      val out = freshDir()
      val st = KgPipeline.run(spark, df, KgPipeline.Config(out, numBuckets = 8, dedupExact = dedup))
      (spark.read.parquet(s"$out/triples").select("subj", "pred", "obj")
        .as[(String, String, String)].collect().toSet, st)
    }
    val (dedupT, dedupStats) = triples(full, dedup = true)
    val (uniqueT, _) = triples(unique, dedup = false)
    assert(dedupStats.docsDeduped == 40)
    assert(dedupStats.docs == 100)
    assert(dedupT == uniqueT)
  }

  test("dedupNear collapses near-duplicate pages to one winner's triples") {
    import spark.implicits._
    val originals = (0L until 80L).map(WebTextGen.page(_))
    // 25 NEAR-clones: same text plus two appended non-dictionary tokens
    // (markup re-rendered so the html↔text invariant holds) under lexically
    // larger urls — exact dedup cannot see these, near-dup must
    val clones = originals.take(25).zipWithIndex.map { case (p, i) =>
      val url = s"https://zz-mirror.example/near/$i"
      val text = p.text + " zz yy"
      p.copy(url = url, text = text,
        html = graft.html.HtmlGen.render(url, s"near $i", text))
    }
    val full = spark.createDataset(scala.util.Random.shuffle(originals ++ clones)).toDF()

    def triples(df: org.apache.spark.sql.DataFrame, near: Boolean) = {
      val out = freshDir()
      val st = KgPipeline.run(spark, df, KgPipeline.Config(out, numBuckets = 8,
        dedupNear = near, nearMinJaccard = 0.8))
      (spark.read.parquet(s"$out/triples").select("subj", "pred", "obj")
        .as[(String, String, String)].collect().toSet, st)
    }
    val (nearT, nearStats) = triples(full, near = true)
    val (uniqueT, _) = triples(spark.createDataset(originals).toDF(), near = false)
    assert(nearStats.docsNearDeduped == 25, s"stats: $nearStats")
    assert(nearStats.docs == 80)
    // winners are the min-url originals, so the triple set equals the
    // pre-deduped corpus's exactly (the clones' ' zz yy' suffix never
    // reaches the annotator)
    assert(nearT == uniqueT)
  }

  test("dedup manifest keeps resume byte-identical across a crash") {
    import spark.implicits._
    val originals = (0L until 100L).map(WebTextGen.page(_))
    val clones = originals.take(30).zipWithIndex.map { case (p, i) =>
      p.copy(url = s"https://zz-mirror.example/copy/$i")
    }
    val full = spark.createDataset(originals ++ clones).toDF()
    val out = freshDir()
    val cfg = KgPipeline.Config(out, numBuckets = 8, dedupExact = true)
    KgPipeline.run(spark, full, cfg)
    val before = spark.read.parquet(s"$out/triples")
      .select("subj", "pred", "obj").as[(String, String, String)].collect().toSet

    // crash simulation: two buckets lose their metrics commit + triples;
    // the dedup manifest (written before any bucket) survives, so the
    // resumed slice must re-derive the SAME winners
    val kept = spark.read.parquet(s"$out/metrics").filter(!col("bucket").isin(1, 6)).collect()
    val schema = spark.read.parquet(s"$out/metrics").schema
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$out/metrics"))
    spark.createDataFrame(java.util.Arrays.asList(kept: _*), schema)
      .coalesce(1).write.parquet(s"$out/metrics")
    Seq(1, 6).foreach { b =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$out/triples/bucket=$b"))
    }
    val s2 = KgPipeline.run(spark, full, cfg)
    assert(s2.bucketsProcessed == 2)
    val after = spark.read.parquet(s"$out/triples")
      .select("subj", "pred", "obj").as[(String, String, String)].collect().toSet
    assert(after == before)
  }

  test("two aliases of one entity in a doc yield ONE triple (both link paths)") {
    import spark.implicits._
    // craft a page whose text plants both "spark" and "merge" twice via
    // the standard generator, then link with a dictionary where several
    // surfaces canonicalize to the same entity
    val pages = WebTextGen.pages(spark, 120, 4).toDF()
    val collidingAliases = Seq(
      ("spark", "ent:spark", 0.9), ("stream", "ent:spark", 0.8), // collide
      ("merge", "ent:merge", 0.75), ("sort", "ent:merge", 0.7))  // collide
    def run(salted: Boolean): Seq[(String, String, String)] = {
      val out = freshDir()
      KgPipeline.run(spark, pages, KgPipeline.Config(out, numBuckets = 8,
        aliases = collidingAliases, saltedLinking = salted))
      spark.read.parquet(s"$out/triples").select("subj", "pred", "obj")
        .as[(String, String, String)].collect().toSeq
    }
    val broadcastT = run(salted = false)
    val saltedT = run(salted = true)
    // no duplicates survive on either path, and the paths agree exactly
    assert(broadcastT.distinct.size == broadcastT.size)
    assert(broadcastT.toSet == saltedT.toSet && saltedT.distinct.size == saltedT.size)
    // a TRUE duplicate needs the same (subj, pred): "merge" and "sort" are
    // both OPERATION→performs and both map to ent:merge — docs containing
    // both must still emit exactly one (ent:merge, performs, url) triple
    val both = pages.filter(col("text").contains("merge") && col("text").contains("sort"))
      .select("url").as[String].collect().toSet
    assert(both.nonEmpty)
    val mergeTriples = broadcastT.filter(t => both.contains(t._3.stripPrefix("page://"))
      && t._1 == "ent:merge" && t._2 == "performs")
    assert(mergeTriples.size == both.size) // exactly one per doc, not two
  }

  test("salted-linking path yields identical triples to the broadcast path") {
    import spark.implicits._
    val outA = freshDir()
    val outB = freshDir()
    val pages = WebTextGen.pages(spark, 250, 4).toDF()
    KgPipeline.run(spark, pages, KgPipeline.Config(outA, numBuckets = 8))
    KgPipeline.run(spark, pages, KgPipeline.Config(outB, numBuckets = 8,
      saltedLinking = true, saltFactor = 4))
    def tset(out: String) = spark.read.parquet(s"$out/triples")
      .select("subj", "pred", "obj").as[(String, String, String)]
      .collect().toSet
    assert(tset(outA) == tset(outB))
  }

  test("skew: hot domains concentrate urls but buckets stay balanced") {
    import spark.implicits._
    val pages = WebTextGen.pages(spark, 2000, 4).toDF()
    val byDomain = pages
      .withColumn("domain", regexp_extract(col("url"), "https://([^.]+)", 1))
      .groupBy("domain").count()
    val hot = byDomain.filter(col("domain").startsWith("hot-")).agg(sum("count")).head().getLong(0)
    assert(hot > 200, "hot domains should hold a substantial share")
    // url-hash bucketing spreads hot-domain rows uniformly: no bucket > 3x mean
    val buckets = pages.withColumn("b", KgPipeline.bucketCol(16))
      .groupBy("b").count().as[(Long, Long)].collect()
    val mean = buckets.map(_._2).sum.toDouble / buckets.length
    assert(buckets.forall(_._2 < 3 * mean))
  }
}
