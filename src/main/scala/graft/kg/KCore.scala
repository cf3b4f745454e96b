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

  /** WEIGHTED s-core (Eidsaa–Almaas "s-core network decomposition",
    * PRE'13): peel nodes whose STRENGTH — the sum of incident edge
    * weights — falls below `s`, to a fixpoint. The weighted analog of
    * [[coreWithRounds]] for graphs where tie strength, not tie count,
    * carries the signal (co-occurrence multiplicities, similarity
    * weights). Same loop shape (per round one strength aggregate + two
    * semi-joins), same measured-round memo contract, same loud
    * non-fixpoint failure. Integer weights — strengths fold exactly.
    * Input: canonical weighted edges `(u, v, w)`. */
  def strengthCoreWithRounds(spark: SparkSession, weighted: DataFrame,
      s: Long, maxIter: Int = 200): (DataFrame, Int) = {
    require(s >= 1, s"s must be >= 1, got $s")
    def strengths(e: DataFrame): DataFrame =
      e.select(col("u").as("node"), col("w"))
        .union(e.select(col("v").as("node"), col("w")))
        .groupBy("node").agg(sum(col("w")).as("strength"))

    var edges = weighted.select("u", "v", "w").localCheckpoint()
    var nEdges = edges.count()
    var str = strengths(edges)
    var rounds = 0
    var converged = nEdges == 0L
    while (!converged && rounds < maxIter) {
      val keep = str.filter(col("strength") >= s).select("node")
      val next = edges
        .join(keep.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("node", "v"), Seq("v"), "left_semi")
        .select("u", "v", "w")
        .localCheckpoint()
      val nNext = next.count()
      rounds += 1
      converged = nNext == nEdges
      edges = next
      nEdges = nNext
      str = strengths(edges)
      if (nEdges == 0L) converged = true
    }
    require(converged,
      s"s-core did not reach a fixpoint in $maxIter rounds ($nEdges edges live)")
    (str, rounds)
  }

  /** DuckDB oracle for [[strengthCoreWithRounds]]: the peel unrolled
    * `rounds` times over a weighted-edge CTE body (columns u, v, w). */
  def strengthOracleSql(edgesSql: String, s: Long, rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      val prev = s"e${i - 1}"
      s"""d$i AS MATERIALIZED (SELECT node, sum(w)::BIGINT AS st FROM
         | (SELECT u AS node, w FROM $prev
         |  UNION ALL SELECT v, w FROM $prev) GROUP BY node),
         | k$i AS MATERIALIZED (SELECT node FROM d$i WHERE st >= $s),
         | e$i AS MATERIALIZED (SELECT u, v, w FROM $prev
         |  WHERE u IN (SELECT node FROM k$i)
         |   AND v IN (SELECT node FROM k$i))"""
        .stripMargin.replaceAll("\n", " ")
    }.mkString(", ")
    val last = s"e$rounds"
    val chain = if (rounds == 0) "" else s", $steps"
    s"""WITH e0 AS MATERIALIZED ($edgesSql)$chain
       | SELECT node, sum(w)::BIGINT AS strength FROM
       | (SELECT u AS node, w FROM $last UNION ALL SELECT v, w FROM $last)
       | GROUP BY node""".stripMargin.replaceAll("\n", " ")
  }

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
