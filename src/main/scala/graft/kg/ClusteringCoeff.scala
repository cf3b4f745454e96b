package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Local clustering coefficient per vertex — the per-node companion of the
  * global triangle count ([[Triangles]]): `coeff(v) = 2·T(v) / (d(v)·(d(v)−1))`
  * where `T(v)` is the number of triangles through `v`. On an entity
  * co-occurrence graph this is the standard "how community-like is this
  * entity's neighborhood" signal (Watts–Strogatz '98) — the per-entity
  * density score KG builders use to separate hub entities (low coeff,
  * bridge many contexts) from clique entities (high coeff, one tight
  * topic). The reference has no graph layer (SURVEY.md §2b "Graph");
  * this extends the engine-added family.
  *
  * Scale shape: identical to [[Triangles.count]] — the degree-ordered
  * wedge join bounds candidate wedges at O(|E|^{3/2}) regardless of
  * degree skew — plus ONE narrow per-triangle explode (each closed
  * triangle charges its three corners) and one map-side-combined
  * aggregation keyed by node. The degree join back is vocabulary-sized
  * and AQE picks broadcast when it fits. Nothing new shuffles beyond
  * q53's plan.
  */
object ClusteringCoeff {

  /** `(node, degree, n_triangles, coeff)` for every vertex of the
    * canonical (u<v, distinct) edge list; `coeff` rounded to 4 decimals,
    * 0.0 for degree-1 vertices (no possible wedge). */
  def run(spark: SparkSession, canonical: DataFrame,
      maxBroadcastEdges: Long = 5000000L): DataFrame = {
    val perVertex = Triangles.closedTriangles(canonical, maxBroadcastEdges)
      // charge each triangle to its three corners: a narrow explode, then
      // one aggregation — never three passes over the triangle stream
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    // degrees from the PERSISTED oriented list (each edge appears exactly
    // once, reoriented) rather than from `canonical` — re-deriving the
    // canonical subtree would replay the whole edge-derivation join a
    // second time, while this is a scan of the cache the triangle probe
    // materialized anyway
    val oriented = Triangles.orientedOf(canonical)
    oriented.select(col("a").as("node"))
      .union(oriented.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
      .join(perVertex, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        round(
          when(col("degree") >= 2,
            lit(2.0) * coalesce(col("n_triangles"), lit(0L)) /
              (col("degree") * (col("degree") - lit(1.0))))
            .otherwise(lit(0.0)), 4).as("coeff"))
  }

  /** The identical computation as SQL over a canonical edge CTE: triangle
    * enumeration by the ascending-id join (fine at oracle scale), corner
    * charge via three stacked projections, then the same closed-form
    * coefficient. `edgesSql` must yield distinct (u, v) with u < v. */
  def oracleSql(edgesSql: String): String =
    s"""WITH edges AS MATERIALIZED ($edgesSql),
       | und AS (SELECT u AS w, v AS n FROM edges
       |   UNION ALL SELECT v AS w, u AS n FROM edges),
       | deg AS (SELECT w, count(*) AS d FROM und GROUP BY w),
       | tri AS (SELECT e1.u AS x, e1.v AS y, e2.v AS z
       |   FROM edges e1 JOIN edges e2 ON e2.u = e1.u AND e2.v > e1.v
       |   JOIN edges e3 ON e3.u = e1.v AND e3.v = e2.v),
       | corner AS (SELECT x AS n FROM tri UNION ALL SELECT y FROM tri
       |   UNION ALL SELECT z FROM tri),
       | tc AS (SELECT n, count(*) AS t FROM corner GROUP BY n)
       | SELECT deg.w AS node, deg.d AS degree,
       |  coalesce(tc.t, 0) AS n_triangles,
       |  round(CASE WHEN deg.d >= 2
       |    THEN 2.0 * coalesce(tc.t, 0) / (deg.d * (deg.d - 1.0))
       |    ELSE 0.0 END, 4) AS coeff
       | FROM deg LEFT JOIN tc ON tc.n = deg.w"""
      .stripMargin.replaceAll("\n", " ")
}
