package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

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
}
