package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed triangle counting over an undirected edge list — the
  * standard graph statistic for co-occurrence graphs (clustering /
  * community density over entity or product co-mention networks; the
  * reference has no graph layer at all, see SURVEY.md §2b "Graph").
  *
  * Algorithm: the degree-ordered node-iterator join (Suri & Vassilvitskii,
  * "Counting Triangles and the Curse of the Last Reducer", WWW'11). Each
  * undirected edge is oriented from its lower-(degree, id) endpoint to its
  * higher one, so every triangle is counted exactly once and — the scale
  * property — the out-degree of every node is bounded by O(sqrt(|E|)):
  * the wedge join `oriented(a,b) ⋈ oriented(b,c)` materializes
  * Σ outdeg(v)² candidate wedges, which degree orientation caps at
  * O(|E|^{3/2}) regardless of how skewed the raw degree distribution is.
  * Without the orientation a single celebrity node with degree d emits d²
  * wedges — the "curse of the last reducer" this layout exists to avoid.
  *
  * Plan shape: two shuffled equi-joins (wedge build on `b`, closure probe
  * on `(a, c)`), each a plain hash join Catalyst can plan freely; degrees
  * are one map-side-combined aggregation. Nothing is collected to the
  * driver; the result is a single global count row.
  */
object Triangles {

  /** Canonical undirected edges `(u, v)` with `u < v`, deduplicated. */
  def canonicalEdges(edges: DataFrame, src: String, dst: String): DataFrame =
    edges
      .filter(col(src) =!= col(dst))
      .select(least(col(src), col(dst)).as("u"), greatest(col(src), col(dst)).as("v"))
      .distinct()

  /** Orients canonical edges by (degree, id) and counts triangles.
    * Input must be the output of [[canonicalEdges]] (u < v, distinct).
    *
    * Closure-probe strategy, decided from the MEASURED edge count (the
    * oriented list is persisted anyway, so the count just materializes the
    * cache the joins need next): when the edge list fits comfortably in
    * executor memory (≤ `maxBroadcastEdges`), probe the wedge stream
    * against a BROADCAST hash of it instead of shuffling the wedges — the
    * wedge set is O(|E|^{3/2}) (83M rows at sf0.1 for 1.2M edges) while
    * the edge list is O(|E|) (~19 MB), so broadcasting the small side
    * deletes the single biggest exchange of the query (measured
    * 6.2 s → 4.8 s, BASELINE.md). Above the limit the shuffled closure
    * join is the correct plan and is chosen automatically — no caller
    * ever hard-codes a broadcast that OOMs at scale. The 5M-row default
    * keeps the hashed relation at ~80 MB raw (two longs/row) ≈ low
    * hundreds of MB hashed — comfortable executor headroom; the earlier
    * 50M default would have built a multi-GB hashed relation, exactly the
    * OOM the gate exists to prevent.
    *
    * The persisted list lives in the session cache until session end;
    * callers counting many distinct graphs in one long session should
    * `spark.catalog.clearCache()` between corpora. */
  def count(spark: SparkSession, canonical: DataFrame,
      maxBroadcastEdges: Long = 5000000L): DataFrame =
    closedTriangles(canonical, maxBroadcastEdges)
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n_triangles"))

  /** Degree-oriented edge list `(a, b)` shared by [[count]] and
    * [[ClusteringCoeff]]. Persisted — see the multiply-referenced-subplan
    * note in [[closedTriangles]]; CacheManager keys by canonicalized plan,
    * so q53's and q88's invocations over the same graph share ONE copy. */
  private[kg] def orientedOf(canonical: DataFrame): DataFrame = {
    val deg = degreesOf(canonical)
    // orient from lower (degree, id) to higher — total order, ties by id.
    canonical
      .join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"), "u")
      .join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"), "v")
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("u"))
          .otherwise(col("v")).as("a"),
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("v"))
          .otherwise(col("u")).as("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** Undirected degrees `(n, d)` of a canonical (u<v, distinct) list. */
  private[kg] def degreesOf(canonical: DataFrame): DataFrame =
    canonical.select(col("u").as("n"))
      .union(canonical.select(col("v").as("n")))
      .groupBy("n").agg(org.apache.spark.sql.functions.count(lit(1)).as("d"))

  /** The closed-triangle stream `(a, b, c)` — one row per triangle, each
    * triangle exactly once (a precedes b precedes c in (degree, id)
    * order).
    *
    * The oriented list is referenced THREE times (e1/e2/e3) under three
    * different join keys, so no exchange can be reused across the
    * references — [[orientedOf]] persists it once or the whole
    * edge-derivation subtree (dedup + degree joins) recomputes per
    * reference (the same multiply-referenced-subplan rule PageRank's loop
    * invariants follow). */
  private[kg] def closedTriangles(canonical: DataFrame,
      maxBroadcastEdges: Long): DataFrame = {
    val oriented = orientedOf(canonical)
    val nEdges = oriented.count() // materializes the cache; decides the plan
    val e1 = oriented
    val e2 = oriented.select(col("a").as("b"), col("b").as("c"))
    val e3raw = oriented.select(col("a").as("a3"), col("b").as("c3"))
    val e3 = if (nEdges <= maxBroadcastEdges) broadcast(e3raw) else e3raw
    e1.join(e2, "b")
      .join(e3, col("a") === col("a3") && col("c") === col("c3"))
      .select(col("a"), col("b"), col("c"))
  }
}
