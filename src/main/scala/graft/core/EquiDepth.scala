package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Equi-depth histogram construction — the statistics-collection pass a
  * cost-based optimizer runs over every large column (`ANALYZE TABLE
  * ... COMPUTE STATISTICS FOR COLUMNS`): B buckets of (approximately)
  * equal row count with per-bucket cardinality, the selectivity-
  * estimation input for range predicates and the bucketing input for
  * equi-depth range partitioning.
  *
  * Boundaries are the B−1 interior EXACT percentiles (the q55
  * discipline — `percentile`, not the sketch), collected ONCE as a
  * bounded B−1-double driver row (the q42 bounded-collect contract)
  * and embedded as an array literal, so bucket assignment is a pure
  * codegen'd `size(filter(...))` over a constant array — no join, no
  * cross product, no second shuffle of the data beyond the bucket
  * aggregate itself. Assignment by boundary-count (`#{b_i < v}`) is
  * tie-stable: equal values always land in the same bucket on every
  * engine, where an `ntile` window would split ties by row order and
  * drift across engines and partitionings.
  *
  * Scale shape: one exact-percentile aggregate (Spark's `percentile`
  * folds per-partition then merges), one narrow map, one map-side-
  * combinable aggregate. Boundaries are ROUNDED to 4 decimals inside
  * the aggregate (the q55/q87 cross-engine float discipline — both
  * engines then compare against byte-identical boundary operands;
  * type-7 interpolation likely matches bit-for-bit anyway, but the
  * rounding removes "likely" from the contract). */
object EquiDepth {

  /** `(bucket, n, ndv, min_v, max_v)` — the B-bucket equi-depth
    * histogram of `valueCol`; `bucket` = number of interior boundaries
    * strictly below the value (0-based). */
  def histogram(df: DataFrame, valueCol: String, b: Int): DataFrame = {
    require(b >= 2, s"need >= 2 buckets, got $b")
    val ps = (1 until b).map(i => i.toDouble / b)
    val boundsRow = df
      .agg(expr(s"transform(percentile(`$valueCol`, " +
        s"array(${ps.mkString(",")})), x -> round(x, 4))"))
      .head()
    // empty (or all-null) input: percentile yields NULL — return the
    // empty histogram instead of NPE-ing on the null boundary array
    // (the Skyline.pareto isNullAt discipline)
    if (boundsRow.isNullAt(0))
      return df.limit(0).select(lit(0L).as("bucket"), lit(0L).as("n"),
        lit(0L).as("ndv"), lit(0.0).as("min_v"), lit(0.0).as("max_v"))
    val bounds = boundsRow.getSeq[Double](0)
    val arr = array(bounds.map(lit): _*)
    df.select(col(valueCol).cast("double").as("v"))
      .withColumn("bucket", size(filter(arr, x => x < col("v"))).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), countDistinct(col("v")).as("ndv"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"))
  }
}
