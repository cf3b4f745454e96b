package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** k-core decomposition (peel to fixpoint) — the graph-hygiene operator a
  * KG ships before embedding/serving: iteratively delete nodes of degree
  * < k until every survivor has ≥ k neighbors inside the survivor set
  * (Seidman '83). On an entity co-mention graph the k-core is the densely
  * corroborated backbone; the peeled fringe is single-source noise.
  *
  * Algorithm: round-based peel. Each round computes degrees with one
  * map-side-combined aggregation over the current edge list, keeps nodes
  * with `deg ≥ k`, and semi-joins the edge list down on BOTH endpoints.
  * Rounds are DATA-DEPENDENT (the peel cascades), so unlike the fixed-k
  * [[Bfs]] loop this one must bound lineage explicitly: each round's edge
  * list is `localCheckpoint`ed (same discipline as
  * [[ConnectedComponents]]), and the convergence test rides the degree
  * aggregate the round already computes — no extra job per round beyond
  * the count that materializes the checkpoint.
  *
  * Scale: every round is two semi-joins + one aggregation, all keyed by
  * node ids; the edge list only shrinks, so per-round cost is
  * monotonically decreasing. Real-world peels converge in tens of rounds
  * (the cascade depth of the degree distribution), each O(|E_round|).
  */
object KCore {

  /** The k-core as `(node, degree)` — degree measured INSIDE the core —
    * plus the number of peel rounds taken to reach the fixpoint (the
    * round count lets an external oracle unroll the exact computation).
    * Input: canonical undirected edges ([[Triangles.canonicalEdges]]
    * shape — `(u, v)`, u < v, distinct). */
  def coreWithRounds(spark: SparkSession, canonical: DataFrame, k: Int,
      maxIter: Int = 200): (DataFrame, Int) = {
    require(k >= 1, s"k must be >= 1, got $k")
    def degrees(e: DataFrame): DataFrame = e.select(col("u").as("node"))
      .union(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))

    var edges = canonical.select("u", "v").localCheckpoint()
    var nEdges = edges.count()
    var deg = degrees(edges)
    var rounds = 0
    var converged = nEdges == 0L
    while (!converged && rounds < maxIter) {
      val keep = deg.filter(col("degree") >= k).select("node")
      val next = edges
        .join(keep.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("node", "v"), Seq("v"), "left_semi")
        .select("u", "v")
        .localCheckpoint()
      val nNext = next.count()
      rounds += 1
      converged = nNext == nEdges
      edges = next
      nEdges = nNext
      deg = degrees(edges)
      if (nEdges == 0L) converged = true
    }
    // a silent non-fixpoint would make the unrolled oracle peel one round
    // further than the engine did — fail loudly instead
    require(converged,
      s"k-core did not reach a fixpoint in $maxIter rounds ($nEdges edges live)")
    (deg, rounds)
  }

  /** Convenience: just the core nodes with in-core degrees. */
  def core(spark: SparkSession, canonical: DataFrame, k: Int): DataFrame =
    coreWithRounds(spark, canonical, k)._1

  /** DuckDB oracle: the identical peel unrolled `rounds` times over the
    * caller-supplied canonical-edge CTE body (must expose columns u, v). */
  def oracleSql(edgesSql: String, k: Int, rounds: Int): String = {
    // every CTE is MATERIALIZED: each round references its predecessor 3×,
    // so an inlining planner (DuckDB default) would expand the chain to
    // ~3^rounds copies of the base scan and exhaust file handles
    val steps = (1 to rounds).map { i =>
      val prev = s"e${i - 1}"
      s"""d$i AS MATERIALIZED (SELECT node, count(*) AS deg FROM
         | (SELECT u AS node FROM $prev UNION ALL SELECT v FROM $prev) GROUP BY node),
         | k$i AS MATERIALIZED (SELECT node FROM d$i WHERE deg >= $k),
         | e$i AS MATERIALIZED (SELECT u, v FROM $prev
         |  WHERE u IN (SELECT node FROM k$i) AND v IN (SELECT node FROM k$i))"""
        .stripMargin.replaceAll("\n", " ")
    }.mkString(", ")
    val last = s"e$rounds"
    val chain = if (rounds == 0) "" else s", $steps"
    s"""WITH e0 AS MATERIALIZED ($edgesSql)$chain
       | SELECT node, count(*) AS degree FROM
       | (SELECT u AS node FROM $last UNION ALL SELECT v FROM $last)
       | GROUP BY node""".stripMargin.replaceAll("\n", " ")
  }
}
