package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration HITS (hubs & authorities; Kleinberg, JACM 1999) over a
  * directed edge list — the OTHER classic link-analysis signal next to
  * [[PageRank]], and the natural one for the KG's bipartite
  * entity→page grounding graph: a hub is an entity grounded in many
  * authoritative pages, an authority is a page grounded by many strong
  * hub entities (Kleinberg's setting verbatim).
  *
  * Determinism contract — STRONGER than [[PageRank]]'s: all arithmetic
  * is exact BIGINT micros. Scores start at 1 000 000; each half-step
  * sums the opposite score over the in/out edges (an integer sum, so
  * order-independent where a float sum is not) and renormalizes by the
  * round's MAX raw score via integer division `raw * 1000000 div max`
  * (max-normalization, the standard stable HITS variant — Kleinberg's
  * L2 norm would force an order-dependent float sqrt). Every term is a
  * pure integer function of the edge list; an external oracle replays
  * it bit-for-bit. Overflow headroom: raw ≤ in-degree × 10⁶, so int64
  * holds up to ~9·10¹² in-degree — beyond any web graph's hottest node.
  *
  * Scale shape: per iteration TWO aggregations keyed by `dst` then
  * `src` (map-side-combined integer sums) and two joins back to the
  * node list, plus a 1-row max that AQE broadcasts (a `crossJoin` with
  * a scalar aggregate — no driver-side action inside the loop). The
  * loop invariants (edges, nodes) are `localCheckpoint`ed once and the
  * score frame per iteration, so lineage stays flat at any iteration
  * count — the [[ConnectedComponents]] residency contract.
  *
  * Reference context: the reference has no graph ops; this extends the
  * engine-added link-analysis family (SURVEY.md §2b "Graph").
  */
object Hits {

  private val One = 1000000L

  /** @param edges directed edges with `src`, `dst` string columns
    *              (duplicates collapse — HITS is defined on the graph).
    * @param iterations fixed full (authority, hub) update rounds.
    * @return `(node, hub_micro, auth_micro)`, exact BIGINT micros with
    *         max = 1 000 000 on each axis after every round. */
  def run(edges: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    var scores = nodes.select(col("node"),
      lit(One).as("hub"), lit(One).as("auth"))
    (1 to iterations).foreach { _ =>
      // authority half-step: raw auth = Σ hub over in-edges
      val aRaw = e.join(scores.select(col("node").as("src"), col("hub")), "src")
        .groupBy(col("dst").as("node")).agg(sum("hub").as("raw"))
      val aNorm = nodes.join(aRaw, Seq("node"), "left")
        .crossJoin(aRaw.agg(max("raw").as("mx")))
        .select(col("node"),
          expr(s"(coalesce(raw, 0L) * ${One}L) div mx").as("auth"))
      // hub half-step: raw hub = Σ NEW auth over out-edges
      val hRaw = e.join(aNorm.select(col("node").as("dst"), col("auth")), "dst")
        .groupBy(col("src").as("node")).agg(sum("auth").as("raw"))
      val hNorm = nodes.join(hRaw, Seq("node"), "left")
        .crossJoin(hRaw.agg(max("raw").as("mx")))
        .select(col("node"),
          expr(s"(coalesce(raw, 0L) * ${One}L) div mx").as("hub"))
      scores = aNorm.join(hNorm, "node")
        .select(col("node"), col("hub"), col("auth")).localCheckpoint()
    }
    scores.select(col("node"), col("hub").as("hub_micro"),
      col("auth").as("auth_micro"))
  }

  /** The identical integer computation as unrolled SQL CTEs (aggregates
    * are barred from recursive terms, so the oracle unrolls like
    * [[PageRank.oracleSql]]); `edgesSql` must yield `(src, dst)` rows
    * (duplicates fine — the prelude collapses them). */
  def oracleSql(edgesSql: String, iterations: Int): String = {
    val steps = (1 to iterations).map { i =>
      s"""ar$i AS (SELECT e.dst AS node, sum(s.hub) AS raw
         |  FROM edges e JOIN s${i - 1} s ON s.node = e.src GROUP BY e.dst),
         | a$i AS (SELECT n.node,
         |   coalesce(ar.raw, 0) * $One // (SELECT max(raw) FROM ar$i) AS auth
         |  FROM nodes n LEFT JOIN ar$i ar ON ar.node = n.node),
         | hr$i AS (SELECT e.src AS node, sum(a.auth) AS raw
         |  FROM edges e JOIN a$i a ON a.node = e.dst GROUP BY e.src),
         | s$i AS (SELECT n.node,
         |   coalesce(hr.raw, 0) * $One // (SELECT max(raw) FROM hr$i) AS hub,
         |   a.auth
         |  FROM nodes n LEFT JOIN hr$i hr ON hr.node = n.node
         |   JOIN a$i a ON a.node = n.node)"""
        .stripMargin.replaceAll("\n", " ")
    }.mkString(", ")
    s"""WITH edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM ($edgesSql)),
      | nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
      | s0 AS (SELECT node, $One AS hub, $One AS auth FROM nodes),
      | $steps
      | SELECT node, hub AS hub_micro, auth AS auth_micro
      | FROM s$iterations""".stripMargin.replaceAll("\n", " ")
  }
}
