package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous label propagation (Raghavan et al. '07) over an undirected
  * edge list — the cheap community-detection pass KG builders run between
  * connected components (too coarse: one label per component) and
  * modularity methods (too expensive at corpus scale). Communities over an
  * entity co-occurrence graph group entities that share contexts — the
  * candidate topic clusters entity-resolution review queues are batched by.
  *
  * Determinism contract (the property the published algorithm lacks):
  * SYNCHRONOUS rounds (round N+1 reads only round N's labels), a FIXED
  * round count, and the tie rule "most frequent neighbor label, ties to
  * the smallest label" — every label is then a pure function of the edge
  * list and an external oracle can unroll the exact rounds. Asynchronous
  * LPA (update-in-place, random visit order) converges faster but is
  * unreplayable and non-deterministic under parallel execution — wrong for
  * an engine whose correctness gate is a cross-engine hash.
  *
  * Scale shape: each round is ONE shuffle — join labels onto the
  * neighbor-expanded edge list keyed by the neighbor, then a two-phase
  * aggregate keyed by (node, label) with map-side combine, then the
  * per-node arg-max as a rank-1 window (Catalyst plans a partial
  * WindowGroupLimit before the exchange, so only per-task top-1 rows
  * shuffle). The edge list is a loop invariant, localCheckpoint-ed once
  * ([[PageRank]]'s rule); label lineage is truncated every ~5 rounds so
  * plan depth stays bounded at any round count.
  */
object LabelProp {

  /** `(node, label)` after `rounds` synchronous propagation rounds over
    * the canonical (u<v, distinct) edge list; labels start as the node's
    * own id. Isolated vertices cannot occur (every vertex comes from an
    * edge). */
  def run(spark: SparkSession, canonical: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    val und = canonical.select(col("u").as("w"), col("v").as("n"))
      .union(canonical.select(col("v").as("w"), col("u").as("n")))
      .localCheckpoint()
    var labels = und.select(col("w").as("node")).distinct()
      .withColumn("label", col("node"))
    val byVotes = Window.partitionBy("node")
      .orderBy(col("votes").desc, col("label").asc)
    (1 to rounds).foreach { i =>
      labels = und.join(labels, und("n") === labels("node"))
        .select(col("w").as("node"), col("label"))
        .groupBy("node", "label").agg(count(lit(1)).as("votes"))
        .withColumn("rn", row_number().over(byVotes))
        .filter(col("rn") === 1)
        .select(col("node"), col("label"))
      if (i % 5 == 0 && i < rounds) labels = labels.localCheckpoint()
    }
    labels
  }

  /** Per-community rollup of a label assignment — the summary a curator
    * reads instead of two thousand node rows: member count, internal edge
    * count (both endpoints share the label), and internal density
    * `2·E_in / (n·(n−1))`. Together with [[run]] this is the complete
    * community-detection deliverable: assignment + quality.
    *
    * Scale shape: two joins attach endpoint labels to the edge list
    * (label relation is node-sized; AQE broadcasts when it fits), then
    * two map-side-combined aggregates keyed by label — output is
    * community-count-sized. Singleton communities (no internal edge)
    * survive via the left join with density 0. */
  def communityRollup(labels: DataFrame, canonical: DataFrame): DataFrame = {
    val members = labels.groupBy("label").agg(count(lit(1)).as("n_members"))
    val internal = canonical
      .join(labels.select(col("node").as("u"), col("label").as("lu")), "u")
      .join(labels.select(col("node").as("v"), col("label").as("lv")), "v")
      .filter(col("lu") === col("lv"))
      .groupBy(col("lu").as("label")).agg(count(lit(1)).as("n_internal"))
    members.join(internal, Seq("label"), "left")
      .select(col("label"), col("n_members"),
        coalesce(col("n_internal"), lit(0L)).as("n_internal"),
        round(when(col("n_members") >= 2,
            lit(2.0) * coalesce(col("n_internal"), lit(0L)) /
              (col("n_members") * (col("n_members") - lit(1.0))))
          .otherwise(lit(0.0)), 4).as("density"))
  }

  /** Shared CTE prefix `edges, und, l0 … lN` for both oracle builders —
    * the edge derivation is materialized ONCE and every consumer below
    * (labels, rollup joins) reads the same relations. */
  private def ctePrefix(edgesSql: String, rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      s"""l$i AS (SELECT node, label FROM (
         |  SELECT und.w AS node, l.label, count(*) AS votes,
         |   row_number() OVER (PARTITION BY und.w
         |     ORDER BY count(*) DESC, l.label) AS rn
         |  FROM und JOIN l${i - 1} l ON l.node = und.n
         |  GROUP BY und.w, l.label) WHERE rn = 1)"""
        .stripMargin.replaceAll("\n", " ")
    }.mkString(", ")
    val tail = if (rounds == 0) "" else s", $steps"
    s"""edges AS MATERIALIZED ($edgesSql),
       | und AS MATERIALIZED (SELECT u AS w, v AS n FROM edges
       |   UNION ALL SELECT v AS w, u AS n FROM edges),
       | l0 AS (SELECT DISTINCT w AS node, w AS label FROM und)$tail"""
      .stripMargin.replaceAll("\n", " ")
  }

  /** [[communityRollup]] over [[oracleSql]]'s final labels as SQL — the
    * final label round is re-materialized (`lab`, read three times) and
    * the internal-edge join reads the SAME materialized `edges` relation
    * the rounds used, so the edge derivation runs once per oracle. */
  def rollupOracleSql(edgesSql: String, rounds: Int): String =
    s"""WITH ${ctePrefix(edgesSql, rounds)},
       | lab AS MATERIALIZED (SELECT node, label FROM l$rounds),
       | e2 AS (SELECT l1.label FROM edges e
       |   JOIN lab l1 ON l1.node = e.u JOIN lab l2 ON l2.node = e.v
       |   WHERE l1.label = l2.label),
       | m AS (SELECT label, count(*) AS n_members FROM lab GROUP BY label),
       | i AS (SELECT label, count(*) AS n_internal FROM e2 GROUP BY label)
       | SELECT m.label, m.n_members, coalesce(i.n_internal, 0) AS n_internal,
       |  round(CASE WHEN m.n_members >= 2
       |    THEN 2.0 * coalesce(i.n_internal, 0) / (m.n_members * (m.n_members - 1.0))
       |    ELSE 0.0 END, 4) AS density
       | FROM m LEFT JOIN i ON i.label = m.label"""
      .stripMargin.replaceAll("\n", " ")

  /** The identical rounds as chained SQL CTEs (`l0 … lN`) — aggregates are
    * forbidden in recursive terms, so the oracle unrolls ([[PageRank]]'s
    * pattern). `edgesSql` must yield distinct (u, v) with u < v. */
  def oracleSql(edgesSql: String, rounds: Int): String =
    s"""WITH ${ctePrefix(edgesSql, rounds)}
       | SELECT node, label FROM l$rounds"""
      .stripMargin.replaceAll("\n", " ")
}
