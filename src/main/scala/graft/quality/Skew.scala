package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-distribution profiler — the measurement step that decides the skew
  * strategy (broadcast / AQE skew-join / explicit salting, SURVEY.md §4).
  * A salted join with a guessed salt factor either under-splits the hot
  * key or pays shuffle amplification on the cold ones; this profiles the
  * actual distribution first and recommends a per-key salt factor.
  *
  * Scale shape: one map-side-combined aggregation over the key column
  * (partial counts per task, one exchange of (key, count) pairs — the
  * aggregate, never the rows), a single-row total, and a top-k via
  * TakeOrdered. Nothing driver-side grows with the key cardinality; the
  * report is the k hottest keys with their share of all rows and
  * `salt_factor` = ceil(count / mean-count) — the number of subtasks the
  * key needs to cost no more than an average key. A cheaper streaming-pass
  * alternative for when even (key,count) is too wide is a count-min sketch;
  * Spark ships one (`count_min_sketch`) and SkewSpec pins its error bound
  * against this exact profile.
  */
object Skew {

  /** Top-k hottest values of `key` with share and recommended salt factor.
    * Deterministic tie-break: count desc, then key asc. */
  def heavyHitters(df: DataFrame, key: String, k: Int): DataFrame = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(
      sum("cnt").as("__tot"), avg("cnt").as("__avg"))
    counts.crossJoin(broadcast(stats))
      .select(
        col(key), col("cnt"),
        round(col("cnt") / col("__tot"), 6).as("frac"),
        ceil(col("cnt") / col("__avg")).as("salt_factor"))
      .orderBy(desc("cnt"), col(key).asc)
      .limit(k)
  }
}
