package graft

import graft.dedup.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: measures the MinHash BANDING stage's shuffle payload under
  * the round-2 layout (each band row carries the full 64-long signature —
  * ~16× amplification through the exchange) vs the round-3 layout (only
  * `(band, bucket, doc_id)` crosses; pairs join back to the persisted
  * signature table). Prints total shuffle bytes written per variant —
  * the evidence behind BASELINE §C's banding-shuffle row. Not part of the
  * driver contract. */
object ShuffleBytesProbe {

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 200000L
    val b = SparkSession.builder()
      .master("local[16]")
      .appName("shuffle-bytes-probe")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
    if (new java.io.File("/dev/shm").isDirectory)
      b.config("spark.local.dir", "/dev/shm/graft-spark-local")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        bytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    def measure(label: String)(f: => Unit): Long = {
      bytes.set(0L)
      f
      Thread.sleep(1000) // let the listener bus drain
      val v = bytes.get()
      println(f"[shuffle-probe] $label%-28s ${v / 1e6}%10.1f MB shuffled")
      v
    }

    // same synthetic webtext the pipeline benches on; signatures persisted
    // and materialized OUTSIDE the measured window (both variants read them
    // from cache, so only the banding exchange differs)
    val docs = spark.range(0, n, 1, 32)
      .map(id => (id, graft.fixtures.WebTextGen.page(id).text))
      .toDF("doc_id", "text")
    val sigs = docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) => (id, Dedup.signatureMd5(Dedup.shingleStrings(text))) }
      .toDF("doc_id", "sig")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sigs.count()

    val bands = Dedup.Bands
    val rows = Dedup.RowsPerBand
    // round-2 layout: the signature rides through the exchange once per band
    val oldBytes = measure("banding r2 (sig x bands)") {
      sigs.as[(Long, Array[Long])]
        .flatMap { case (id, sig) =>
          (0 until bands).map(bd =>
            (bd, sig.slice(bd * rows, (bd + 1) * rows).mkString(","), id, sig))
        }
        .toDF("band", "bucket", "doc_id", "sig")
        .groupBy("band", "bucket")
        .agg(collect_list(struct(col("doc_id"), col("sig"))).as("members"))
        .filter(size(col("members")) > 1).count()
    }
    // round-3 layout: ids only
    val newBytes = measure("banding r3 (ids only)") {
      sigs.as[(Long, Array[Long])]
        .flatMap { case (id, sig) =>
          (0 until bands).map(bd =>
            (bd, sig.slice(bd * rows, (bd + 1) * rows).mkString(","), id))
        }
        .toDF("band", "bucket", "doc_id")
        .groupBy("band", "bucket")
        .agg(collect_list(col("doc_id")).as("members"))
        .filter(size(col("members")) > 1).count()
    }
    println(f"[shuffle-probe] docs=$n reduction=${oldBytes.toDouble / newBytes}%.1fx")
    spark.stop()
  }
}
