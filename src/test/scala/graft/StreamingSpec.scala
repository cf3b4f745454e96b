package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic annotator that fails any batch containing the marker —
  * exercises the streaming path's failed-batch lineage (top-level class:
  * ships into tasks without dragging the suite into the closure). */
final case class FlakyDictAnnotator(dict: Seq[(String, String)], marker: String)
    extends graft.annotate.Annotator {
  override def generate(sys: String, user: String): String =
    graft.annotate.DictAnnotator(dict).generate(sys, user)
  override def generateChecked(sys: String, user: String): (String, Boolean) =
    if (user.contains(marker)) ("", true) else (generate(sys, user), false)
}

/** Structured Streaming coverage: the reference is strictly batch
  * (SURVEY.md §2 "streaming" note); the engine's incremental path is
  * checkpoint-resume, but windowed streaming aggregation is exercised here
  * as the Spark-native streaming face of q09_window_events. */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-streaming-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming windowed agg over events matches the batch result") {
    val dir = "/root/testdata/sf0.001"
    val schema = spark.read.parquet(s"$dir/events.parquet").schema

    // file-stream sources require a directory
    val streamDir = java.nio.file.Files.createTempDirectory("graft-events-")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))

    val stream = spark.readStream.schema(schema).parquet(streamDir.toString)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))

    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("ev_win")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val streamed = spark.table("ev_win")
      .select(col("window.start").cast("long").as("win_start"),
        col("event_type"), col("n_events"))

    val batch = spark.read.parquet(s"$dir/events.parquet")
      .groupBy(
        (floor(col("ts").cast("timestamp").cast("long") / 300) * 300).cast("long").as("win_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))

    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).count() == 0)
    assert(batch.except(streamed).count() == 0)
  }

  test("streaming KG pipeline emits the same triples as the batch pipeline") {
    import spark.implicits._
    import org.apache.spark.sql.functions._

    // write a small page set as the "arriving" directory
    val n = 150L
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-pages-").toString + "/pages"
    graft.fixtures.WebTextGen.pages(spark, n, 2).toDF().write.parquet(dir)
    val schema = spark.read.parquet(dir).schema

    val stream = graft.streaming.StreamingKg.triplesStream(
      spark, spark.readStream.schema(schema).parquet(dir))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("kg_stream").start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("kg_stream")
      .select("subj", "pred", "obj").as[(String, String, String)]
      .collect().toSet

    val out = java.nio.file.Files.createTempDirectory("graft-stream-batch-").toString
    graft.kg.KgPipeline.run(spark, graft.fixtures.WebTextGen.pages(spark, n, 2).toDF(),
      graft.kg.KgPipeline.Config(out, numBuckets = 4))
    val batch = spark.read.parquet(s"$out/triples")
      .select("subj", "pred", "obj").as[(String, String, String)]
      .collect().toSet

    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming path carries failed-batch lineage and honors a pluggable annotator") {
    import spark.implicits._
    val flaky = FlakyDictAnnotator(graft.ner.NerSpark.Dict, "FAILME")
    val good = (0L until 30L).map(graft.fixtures.WebTextGen.page(_))
    val bad = (100L until 105L).map { id =>
      val p = graft.fixtures.WebTextGen.page(id)
      val text = "FAILME " + p.text
      p.copy(html = graft.html.HtmlGen.render(p.url, s"doc $id", text), text = text)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-flaky-pages-").toString + "/pages"
    spark.createDataset(good ++ bad).toDF().write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)

    // lineage: every FAILME page surfaces failed_batches > 0, zero mentions;
    // clean pages are annotated exactly as the batch DictAnnotator would
    val annQ = graft.streaming.StreamingKg
      .annotatedPages(spark, stream, annotator = Some(flaky))
      .writeStream.outputMode("append").format("memory").queryName("ann_pages").start()
    try annQ.processAllAvailable() finally annQ.stop()
    val ann = spark.table("ann_pages")
      .select("url", "n_mentions", "failed_batches").collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(ann.size == 35)
    bad.foreach(p => assert(ann(p.url)._1 == 0 && ann(p.url)._2 > 0,
      s"failed page ${p.url} must surface lineage, got ${ann(p.url)}"))
    assert(good.count(p => ann(p.url)._2 == 0) == 30)

    // triples: the flaky stream equals the default stream minus the failed docs
    val tq = graft.streaming.StreamingKg
      .triplesStream(spark, spark.readStream.schema(schema).parquet(dir),
        annotator = Some(flaky))
      .writeStream.outputMode("append").format("memory").queryName("flaky_triples").start()
    try tq.processAllAvailable() finally tq.stop()
    val streamed = spark.table("flaky_triples")
      .as[(String, String, String)].collect().toSet
    val expected = graft.streaming.StreamingKg
      .triplesStream(spark, spark.createDataset(good).toDF())
      .as[(String, String, String)].collect().toSet
    assert(streamed == expected && streamed.nonEmpty)
  }

  test("WARC stream detects lang with the engine's own language-ID") {
    import spark.implicits._
    val texts = Seq(
      "the house and the garden of the king and the queen",
      "la casa de la reina que canta en la ciudad",
      "zz qq xx") // no profile trigram → und → defaultLang
    val pages = texts.zipWithIndex.map { case (t, i) =>
      (s"https://lang.example/$i", graft.html.HtmlGen.render(s"u$i", s"d$i", t))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-lang-warc-")
    java.nio.file.Files.write(dir.resolve("a.warc.gz"),
      graft.sources.Warc.writeWarcGz(pages))
    val manifest = java.nio.file.Files.createTempDirectory("graft-lang-manifest-")
    java.nio.file.Files.write(manifest.resolve("m.txt"),
      dir.resolve("a.warc.gz").toString.getBytes("UTF-8"))

    val q = graft.streaming.StreamingKg.warcPages(spark, manifest.toString)
      .select("url", "lang")
      .writeStream.outputMode("append").format("memory").queryName("warc_lang").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("warc_lang").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap

    // parity with the batch language-ID on the same extracted texts
    texts.zipWithIndex.foreach { case (t, i) =>
      val batch = graft.quality.TextQuality.detectLang(t)
      val want = if (batch == "und") "en" else batch
      assert(got(s"https://lang.example/$i") == want,
        s"stream lang for doc $i: got ${got(s"https://lang.example/$i")}, want $want")
    }
    assert(got.values.toSet.intersect(Set("en", "es")).size == 2)
  }

  test("streaming fusion: incremental winners match the batch majority vote") {
    import spark.implicits._
    import graft.streaming.StreamingFusion.Claim
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Claim]
    val q = graft.streaming.StreamingFusion.winnersStream(input.toDS())
      .writeStream.outputMode("update").format("memory")
      .queryName("fusion_w").start()
    val batch1 = Seq(Claim("s1", "p", "oB", "x"))
    val batch2 = Seq(
      Claim("s1", "p", "oA", "y"), Claim("s1", "p", "oA", "z"),
      Claim("s1", "p", "oB", "x"), // chatty re-assertion: one vote only
      Claim("s2", "p", "oC", "x"))
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val sink = spark.table("fusion_w").as[graft.streaming.StreamingFusion.Winner]
      .collect()
    // n_claims is monotonic per item, so the current winner is the row
    // with the highest n_claims
    val cur = sink.groupBy(w => (w.subj, w.pred)).view
      .mapValues(_.maxBy(_.n_claims)).toMap
    // parity: the final streamed winners equal a batch majorityVote over
    // ALL claims
    val batch = graft.kg.Fusion.majorityVote(
      (batch1 ++ batch2).toDF("subj", "pred", "obj", "source")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(cur.map { case (k, w) =>
      k -> ((w.obj, w.n_votes, w.n_claims, w.unanimous)) } == batch)
    // the flip was OBSERVABLE: oB led after batch 1, oA leads at the end
    assert(sink.exists(w => w.subj == "s1" && w.obj == "oB" && w.n_claims == 1))
    assert(cur(("s1", "p")).obj == "oA")
  }
}
