package graft.kg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval coalescing — the gaps-and-islands pass that turns a stream
  * of per-key validity intervals into their minimal disjoint cover:
  * overlapping or touching intervals merge into one island
  * `(key, island_start, island_end, n_intervals)`. The temporal-KG /
  * warehouse primitive beside [[Scd2]]'s snapshot-delta history:
  * SCD2 reconstructs versions from observations, this collapses
  * redundant validity claims (crawl windows, lease renewals, session
  * spans) into canonical extents.
  *
  * Algorithm: per key, order intervals by `(start, end, id)` and flag a
  * NEW island exactly when the start exceeds the running maximum of all
  * previous ends (closed-interval semantics: touching endpoints merge);
  * the running sum of flags is the island id, and one aggregate folds
  * each island's extent. The island partition is a function of the
  * interval SET — the tiebreak order only pins window determinism, it
  * cannot change the result.
  *
  * Scale shape: two windows and one aggregate, ALL partitioned by the
  * key — no global window, no single-task funnel; each key's frame
  * streams through one task sorted, which is exactly how warehouse
  * engines run gaps-and-islands. Skewed keys are bounded by per-key
  * interval counts, not corpus size. */
object Intervals {

  /** Coalesce `(key, id, s, e)` closed intervals (s ≤ e, integer
    * timestamps) into islands per key. */
  def coalesceIslands(intervals: DataFrame, key: String, id: String,
      s: String, e: String): DataFrame = {
    val ord: Seq[Column] = Seq(col(s), col(e), col(id))
    val w = Window.partitionBy(key).orderBy(ord: _*)
    val prevMax = max(col(e)).over(
      w.rowsBetween(Window.unboundedPreceding, -1))
    val isNew = when(prevMax.isNull || col(s) > prevMax, 1L).otherwise(0L)
    intervals
      .withColumn("island", sum(isNew).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(key), col("island"))
      .agg(min(col(s)).as("island_start"), max(col(e)).as("island_end"),
        count(lit(1)).as("n_intervals"))
      .select(col(key), col("island"), col("island_start"),
        col("island_end"), col("n_intervals"))
  }
}
