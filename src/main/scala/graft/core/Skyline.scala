package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto-minimal frontier) — Börzsönyi et al.'s SKYLINE
  * OF operator (ICDE'01): the points no other point beats on BOTH
  * axes. The multi-criteria shortlist query (cheapest-vs-smallest,
  * quality-vs-length) that a naive formulation writes as a quadratic
  * NOT-EXISTS self-join.
  *
  * For two minimized dimensions the frontier has a closed sweep form:
  * collapse to one candidate per x (`min y` — anything above it is
  * beaten at equal x), then a candidate survives iff every STRICTLY
  * smaller x has strictly larger min-y. The scale problem is that the
  * sweep is a total order over x — a single global window would funnel
  * the corpus through one task. So the sweep is run TWO-PHASE: fixed-
  * width x-buckets (boundaries from one bounded min/max collect; the
  * bucketing shapes only the computation, never the answer — equal x
  * always lands in one bucket), a per-bucket windowed prefix-min, and
  * a cross-bucket prefix-min over the ≤B-row bucket-minimum table
  * (the one unpartitioned window, bounded by construction — the q158
  * register discipline). A candidate is dominated iff the in-bucket
  * prefix-min OR the earlier-bucket floor is ≤ its y.
  *
  * All comparisons are between unmodified input doubles — no derived
  * arithmetic — so the frontier is deterministic cross-engine, and the
  * oracle can replay the same sweep with one (single-node) window. */
object Skyline {

  /** The Pareto-minimal `(x, y)` set of the distinct point set, both
    * dimensions minimized. */
  def pareto(df: DataFrame, xCol: String, yCol: String,
      buckets: Int = 64): DataFrame = {
    require(buckets >= 1, s"need >= 1 bucket, got $buckets")
    val pts = df.select(col(xCol).cast("double").as("x"),
        col(yCol).cast("double").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
    val perX = pts.groupBy("x").agg(min("y").as("my"))
    val r = pts.agg(min("x"), max("x")).head()
    if (r.isNullAt(0)) return pts.limit(0)
    val (lo, hi) = (r.getDouble(0), r.getDouble(1))
    val width = if (hi > lo) (hi - lo) / buckets else 1.0
    val bk = perX.withColumn("b", least(lit(buckets - 1L),
      floor((col("x") - lit(lo)) / lit(width))).cast("long"))
    val bmin = bk.groupBy("b").agg(min("my").as("bm"))
    val floorPrev = bmin.withColumn("pm", min("bm").over(
      Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)))
    val inBucket = Window.partitionBy("b").orderBy("x")
      .rowsBetween(Window.unboundedPreceding, -1)
    bk.withColumn("prevmin", min("my").over(inBucket))
      .join(floorPrev.select("b", "pm"), Seq("b"), "left")
      .filter((col("prevmin").isNull || col("prevmin") > col("my")) &&
        (col("pm").isNull || col("pm") > col("my")))
      .select(col("x"), col("my").as("y"))
  }
}
