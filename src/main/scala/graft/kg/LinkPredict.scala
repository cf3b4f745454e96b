package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link prediction over an undirected co-occurrence graph — the relation-
  * inference step that closes the KG-construction loop: after entities are
  * linked and co-mention edges counted, propose the MISSING edges whose
  * neighborhoods overlap more than chance. Scores are the three classical
  * neighborhood measures (Liben-Nowell & Kleinberg '03): common-neighbor
  * count, Jaccard overlap of neighborhoods, and Adamic-Adar
  * (Σ_w 1/ln deg(w) over shared neighbors — rare shared neighbors count
  * more than celebrity ones).
  *
  * Scale shape: candidate pairs come from WEDGE enumeration, not an
  * all-pairs join — each center node emits its neighbor pairs from ONE
  * aggregated sorted array ([[Cooccur]]'s posexplode+slice layout, pure
  * Catalyst). Per-center fan-out is deg²/2, so hubs are the scale hazard
  * ("curse of the last reducer"); the cap excludes centers above
  * `maxHubDegree` BEFORE the array is built, which (a) bounds every
  * aggregation buffer and every per-row explode at maxHubDegree entries,
  * and (b) is principled for Adamic-Adar — an excluded hub's per-wedge
  * weight 1/ln(deg) is exactly the term the measure already discounts
  * toward zero. Degrees for Jaccard use the FULL graph (the cap gates
  * only wedge centers, not score semantics). The existing-edge anti-join
  * runs on the canonical (u<v) orientation both sides share, and the
  * vocabulary-sized degree relation joins back via AQE broadcast.
  */
object LinkPredict {

  /** Data-relative wedge-center cap: the `pct` exact degree percentile of
    * the graph, floored to a long (≥ 2 so a center can still have a
    * wedge). A fixed cap constant is tuned to ONE graph density — at a
    * different scale factor it either admits every hub (cap above the
    * degree ceiling: the quadratic blow-up returns) or excludes everything.
    * The percentile form is the production knob: "skip the densest
    * (1−pct) of centers" holds at any density, and it is exactly what the
    * q52 heavy-hitter profiler reports. Cost: one degree aggregate + a
    * single-group percentile — vocabulary-sized, run once and memoized by
    * the caller (the oracle inlines the measured value, like q73's
    * measured peel depth). */
  def measuredHubCap(canonical: DataFrame, pct: Double = 0.75): Long = {
    val und = canonical.select(col("u").as("w"))
      .union(canonical.select(col("v").as("w")))
    val d = und.groupBy("w").agg(count(lit(1)).as("d"))
      .agg(coalesce(expr(s"percentile(d, $pct)"), lit(2.0))).head().getDouble(0)
    math.max(2L, d.toLong)
  }

  /** Scored non-adjacent candidate pairs
    * `(e1, e2, n_common, jaccard, score_aa)` with `e1 < e2`, keeping pairs
    * with ≥ `minCommon` shared neighbors. (The Adamic-Adar column is named
    * so it sorts AFTER the unique (e1, e2) key — the driver's compare
    * sorts columns alphabetically, and a float must never lead the row
    * ordering or 1-ulp cross-engine drift can swap tied rows.)
    *
    * @param canonical     output of [[Triangles.canonicalEdges]] (u<v, distinct)
    * @param maxHubDegree  wedge centers above this degree are skipped
    * @param minCommon     emit only pairs with at least this many shared
    *                      neighbors (the support threshold that keeps the
    *                      candidate list proposal-sized, not quadratic)
    */
  def candidates(canonical: DataFrame, maxHubDegree: Long,
      minCommon: Long): DataFrame = {
    val und = canonical.select(col("u").as("w"), col("v").as("n"))
      .union(canonical.select(col("v").as("w"), col("u").as("n")))
    val deg = und.groupBy("w").agg(count(lit(1)).as("d"))

    // per-center sorted neighbor array, hub centers excluded up front so
    // the collect_set buffer is bounded at maxHubDegree entries (the
    // inner join both filters and attaches d — one join, not semi+join)
    val lists = und
      .join(deg.filter(col("d") <= maxHubDegree), "w")
      .groupBy(col("w"), col("d"))
      .agg(sort_array(collect_set(col("n"))).as("ns"))
    val wedges = lists
      .select(col("d"), posexplode(col("ns")).as(Seq("i", "e1")), col("ns"))
      // slice is 1-based: neighbors strictly after position i (0-based e1)
      .select(col("e1"),
        explode(slice(col("ns"), col("i") + 2, size(col("ns")))).as("e2"),
        // a wedge center has >= 2 neighbors, so ln(d) > 0 here
        (lit(1.0) / log(col("d").cast("double"))).as("aw"))
    val scored = wedges.groupBy("e1", "e2")
      .agg(count(lit(1)).as("n_common"), sum(col("aw")).as("aa_raw"))
      .filter(col("n_common") >= minCommon)

    scored
      // link PREDICTION proposes absent edges — drop pairs already joined
      .join(canonical.select(col("u").as("e1"), col("v").as("e2")),
        Seq("e1", "e2"), "left_anti")
      .join(deg.select(col("w").as("e1"), col("d").as("d1")), "e1")
      .join(deg.select(col("w").as("e2"), col("d").as("d2")), "e2")
      .select(col("e1"), col("e2"), col("n_common"),
        round(col("n_common") / (col("d1") + col("d2") - col("n_common")), 4)
          .as("jaccard"),
        round(col("aa_raw"), 4).as("score_aa"))
  }
}
