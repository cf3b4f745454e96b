package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-step funnel analysis over the event stream — the behavioral
  * query every web-analytics engine ships (view → click → purchase
  * conversion within a window), and the product-side complement of the
  * sessionization (q40) and as-of attribution (q45) family: those
  * segment the stream, this measures ordered progression through it.
  *
  * Semantics: step 1 anchors at the user's FIRST occurrence of the
  * first event type; each later step is the first qualifying
  * occurrence STRICTLY after the previous step's time and within
  * `windowSec` of it. A user whose candidate events all fall outside
  * the window keeps a NULL step time (conditional `min(when(...))`
  * aggregation — never a filter, which would silently drop the user's
  * row and understate drop-off). A null previous step nulls the
  * condition, so failure cascades forward without special-casing.
  *
  * Scale shape: one key-partitioned conditional-min aggregate per step
  * over the per-type filtered stream (the type equality pushes to the
  * scan), joined back on the user key — every aggregate map-side
  * combinable, no windows, no per-user event sorting. Steps are a
  * fixed small list, so plan depth is bounded by construction. */
object Funnel {

  /** `(user_id, t1..tN, reached)` — per-user step times in epoch
    * seconds (null = step not reached) and the count of completed
    * steps. `steps` are event types in funnel order (≥ 2). */
  def run(events: DataFrame, steps: Seq[String], windowSec: Long): DataFrame = {
    require(steps.length >= 2, s"funnel needs >= 2 steps, got ${steps.length}")
    val e = events.select(col("user_id"), col("event_type"),
      col("ts").cast("timestamp").cast("long").as("sec"))
    val first = e.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min("sec").as("t1"))
    val full = steps.tail.zipWithIndex.foldLeft(first) {
      case (acc, (st, i)) =>
        val prev = s"t${i + 1}"
        val cur = s"t${i + 2}"
        val keys = acc.columns.map(col)
        acc.join(
            e.filter(col("event_type") === st)
              .select(col("user_id"), col("sec")),
            Seq("user_id"), "left")
          .groupBy(keys: _*)
          .agg(min(when(col("sec") > col(prev) &&
            col("sec") <= col(prev) + windowSec, col("sec"))).as(cur))
    }
    val reachedCols = (2 to steps.length).map(i =>
      when(col(s"t$i").isNotNull, 1L).otherwise(0L))
    full.withColumn("reached",
      reachedCols.foldLeft(lit(1L): org.apache.spark.sql.Column)(_ + _))
  }
}
