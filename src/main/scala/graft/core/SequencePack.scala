package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Greedy sequential sample packing — the step that turns a filtered corpus
  * into fixed-width training context windows: every document gets its
  * global token start-offset in doc_id order, and `pack_id = offset div
  * window` assigns it to a context window. (Real packers also split
  * overlong docs; the offset assignment below is the distributed part —
  * the split is a narrow per-row explode on top of it.)
  *
  * A global running sum is the textbook anti-pattern (a single-task
  * `Window.orderBy` over the corpus), so this is the classic DISTRIBUTED
  * PREFIX SUM instead: bucket by contiguous doc_id ranges, aggregate one
  * total per bucket, prefix-scan the ~`nBuckets` totals on the driver (a
  * bounded collect, documented — thousands of entries at most), broadcast
  * the bucket offsets back, and run the within-bucket running sum as a
  * per-bucket window. Each task sorts one bucket (corpus/nBuckets rows);
  * no stage ever sees the whole corpus on one core. Deterministic and
  * slice-stable: offsets depend only on (doc_id, n_tokens).
  */
object SequencePack {

  /** The distributed exclusive prefix sum itself, shared with
    * [[WeightedSample]] so the two offset consumers cannot drift: input
    * `(doc_id: long, w: long)`, output adds `start_offset` = Σ w over all
    * rows with smaller doc_id. Bucket totals (≤ `nBuckets` rows) are the
    * only driver-side data. */
  def prefixOffsets(spark: SparkSession, weighted: DataFrame,
      nBuckets: Int = 256): DataFrame = {
    import spark.implicits._
    // contiguous doc_id ranges ⇒ (bucket asc, doc_id asc) == global order;
    // the range width is measured from the data, not assumed
    val maxId = weighted.agg(coalesce(max("doc_id"), lit(0L))).head().getLong(0)
    val span = maxId / nBuckets + 1
    // a negative weight would silently corrupt every downstream
    // start_offset (the interval [start, start+w) inverts) — fail loudly
    // per row instead, with zero extra jobs (codegen'd domain check)
    val wOk = when(col("w") < 0, raise_error(concat(
        lit("prefixOffsets: negative weight for doc_id "),
        col("doc_id").cast("string"))).cast("long"))
      .otherwise(col("w"))
    val bucketed = weighted.withColumn("w", wOk)
      .withColumn("b", (col("doc_id") / span).cast("int"))
    val totals = bucketed.groupBy("b").agg(sum("w").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    var acc = 0L
    val offsets = totals.keys.toSeq.sorted.map { b =>
      val row = (b, acc); acc += totals(b); row
    }.toDF("b", "bucket_offset")
    val win = Window.partitionBy("b").orderBy("doc_id")
    bucketed.join(broadcast(offsets), "b")
      .withColumn("start_offset",
        col("bucket_offset") + sum("w").over(win) - col("w"))
      .drop("b", "bucket_offset")
  }

  /** `(doc_id, n_tokens, start_offset, pack_id)` for every document
    * (token-free docs occupy zero width but keep their position). */
  def pack(spark: SparkSession, docs: DataFrame, window: Int,
      nBuckets: Int = 256): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val counts = docs.select(col("doc_id").cast("long").as("doc_id"),
      size(filter(split(trim(col("text")), "\\s+"), t => t =!= lit("")))
        .cast("long").as("n_tokens"))
    prefixOffsets(spark, counts.withColumnRenamed("n_tokens", "w"), nBuckets)
      .select(col("doc_id"), col("w").as("n_tokens"), col("start_offset"),
        // integer div, not floor(double /): offsets at 100 TB exceed the
        // 53-bit exactness of a double quotient
        expr(s"start_offset div $window").as("pack_id"))
  }
}
