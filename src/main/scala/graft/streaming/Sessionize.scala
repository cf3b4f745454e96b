package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event log — the canonical clickstream
  * rollup (and the batch analog of Structured Streaming's
  * `session_window`, which shares the same gap semantics): consecutive
  * events of one user belong to the same session while the inter-event
  * gap stays ≤ `gapSeconds`; the first event past the gap opens a new
  * session.
  *
  * Scale shape: ONE shuffle, keyed by `user_id`. Both window passes (the
  * lag that marks session starts and the running sum that numbers them)
  * share the same `partitionBy(user_id)` spec, so Catalyst plans a single
  * Exchange + one sort; the session rollup that follows groups by
  * (user_id, session_idx), which AQE coalesces onto the same hash
  * partitioning — no second wide stage over the raw events. Per-user
  * state is a sort buffer, not a materialized array, so a hot user costs
  * sort spill, never an OOM. Tie order within a second is pinned by
  * `event_id` (the q45 convention) so session numbering is deterministic.
  */
object Sessionize {

  /** Per-session rollup `(user_id, session_idx, n_events, start_sec,
    * end_sec, duration_s)`; `session_idx` is 1-based in event-time order.
    *
    * @param events     rows with `user_id`, `event_id` and a `sec` epoch
    *                   column (bigint seconds)
    * @param gapSeconds inactivity gap that closes a session
    */
  def sessions(events: DataFrame, gapSeconds: Long): DataFrame = {
    val byTime = Window.partitionBy("user_id").orderBy("sec", "event_id")
    val starts = events
      .withColumn("prev_sec", lag(col("sec"), 1).over(byTime))
      .withColumn("is_start",
        (col("prev_sec").isNull ||
          col("sec") - col("prev_sec") > gapSeconds).cast("long"))
    starts
      .withColumn("session_idx", sum(col("is_start")).over(byTime))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("sec")).as("start_sec"),
        max(col("sec")).as("end_sec"))
      .withColumn("duration_s", col("end_sec") - col("start_sec"))
  }
}
