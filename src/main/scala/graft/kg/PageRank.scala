package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over a directed edge list — the standard
  * entity-importance signal for a knowledge graph (rank entities by how
  * much linked-document mass flows into them).
  *
  * Determinism contract: a FIXED iteration count (no convergence
  * sampling), `0.15 + 0.85 · inflow` with literal constants, dangling
  * nodes simply contribute nothing (no redistribution) — every term is a
  * pure function of the edge list, so an external oracle can replay the
  * exact arithmetic. Scale shape: each round is ONE shuffle keyed by
  * `dst` (contribution aggregation) plus the broadcast-or-shuffle join
  * back to the node list; the loop plan grows linearly with iterations —
  * at corpus scale checkpoint every ~5 rounds to cut lineage, exactly as
  * [[ConnectedComponents]] documents.
  *
  * Reference context: the reference has no graph ops; this extends the
  * engine-added CC family (SURVEY.md §2b "Graph").
  */
object PageRank {

  /** @param edges DataFrame with `src`, `dst` string columns (directed).
    * @return (node, rank) — rank rounded to 6 decimals for stable compare. */
  def run(spark: SparkSession, edges: DataFrame, iterations: Int,
      damping: Double = 0.85): DataFrame = {
    // The three loop invariants are materialized ONCE (localCheckpoint cuts
    // their lineage back to a cached RDD scan) — otherwise every iteration's
    // plan re-embeds whatever subtree produced the edge list (in q41 that is
    // the full mention-extraction pipeline), and the inflow+degree joins
    // replay it ~2× per round. pre-join deg onto the edge list so the loop
    // body is ONE join + ONE aggregation per round.
    val e0 = edges.select(col("src"), col("dst")).distinct().localCheckpoint()
    val nodes = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node"))).distinct().localCheckpoint()
    val e = e0.join(e0.groupBy("src").agg(count(lit(1)).as("deg")), "src")
      .localCheckpoint()
    var ranks = nodes.withColumn("rank", lit(1.0))
    (1 to iterations).foreach { i =>
      val inflow = e.join(ranks, e("src") === ranks("node"))
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
        .groupBy("node").agg(sum("c").as("inflow"))
      ranks = nodes.join(inflow, Seq("node"), "left")
        .select(col("node"),
          (lit(1 - damping) + lit(damping) * coalesce(col("inflow"), lit(0.0)))
            .as("rank"))
      // truncate the rank lineage every ~5 rounds so the plan depth stays
      // bounded at any iteration count (matches ConnectedComponents.run)
      if (i % 5 == 0 && i < iterations) ranks = ranks.localCheckpoint()
    }
    ranks.select(col("node"), round(col("rank"), 6).as("rank"))
  }

  /** Personalized PageRank from a seed set — the "relevance to THIS
    * entity" variant: teleport mass goes to the seeds (uniformly, `1/|S|`
    * each) instead of everywhere, so rank measures random-walk proximity
    * to the seed neighborhood. KG builders use PPR for related-entity
    * panels and for expanding an entity-resolution block around a
    * canonical node (Jeh & Widom '03 scaled walks; Andersen et al. '06).
    *
    * Same determinism contract and loop shape as [[run]]: fixed
    * iterations, literal constants, dangling mass dropped; the ONLY
    * change is the teleport vector, which is seed-set-sized and joins
    * the node list once (left join → 1/|S| or 0), then rides the loop as
    * a column of the checkpointed node frame — no per-round extra join.
    *
    * @param seeds single-column DataFrame of seed node ids (column name
    *              irrelevant; must be non-empty and a subset of nodes). */
  def personalized(spark: SparkSession, edges: DataFrame, seeds: DataFrame,
      iterations: Int, damping: Double = 0.85): DataFrame = {
    val e0 = edges.select(col("src"), col("dst")).distinct().localCheckpoint()
    val seedList = seeds.select(seeds.columns.head).distinct()
      .withColumnRenamed(seeds.columns.head, "node")
    val nSeeds = seedList.count()
    require(nSeeds > 0, "personalized PageRank needs a non-empty seed set")
    val nodes = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node"))).distinct()
      .join(seedList.withColumn("is_seed", lit(true)), Seq("node"), "left")
      .select(col("node"),
        when(col("is_seed"), lit(1.0 / nSeeds)).otherwise(lit(0.0)).as("tele"))
      .localCheckpoint()
    val e = e0.join(e0.groupBy("src").agg(count(lit(1)).as("deg")), "src")
      .localCheckpoint()
    var ranks = nodes.withColumn("rank", col("tele"))
    (1 to iterations).foreach { i =>
      val inflow = e.join(ranks, e("src") === ranks("node"))
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
        .groupBy("node").agg(sum("c").as("inflow"))
      ranks = nodes.join(inflow, Seq("node"), "left")
        .select(col("node"), col("tele"),
          (lit(1 - damping) * col("tele") +
            lit(damping) * coalesce(col("inflow"), lit(0.0))).as("rank"))
      if (i % 5 == 0 && i < iterations) ranks = ranks.localCheckpoint()
    }
    ranks.select(col("node"), round(col("rank"), 6).as("rank"))
  }

  /** [[personalized]] unrolled as SQL CTEs; `seedsSql` must yield one
    * `node` column (the seed set). */
  def personalizedOracleSql(edgesSql: String, seedsSql: String,
      iterations: Int, damping: Double = 0.85): String = {
    val steps = (1 to iterations).map { i =>
      s"""r$i AS (SELECT n.node,
         | ${1 - damping} * n.tele + $damping * coalesce(s.inflow, 0.0) AS rank
         | FROM tnodes n LEFT JOIN (
         |  SELECT e.dst AS node, sum(r.rank / d.deg) AS inflow
         |  FROM edges e JOIN r${i - 1} r ON r.node = e.src
         |    JOIN deg d ON d.src = e.src
         |  GROUP BY e.dst) s ON s.node = n.node)"""
        .stripMargin.replaceAll("\n", " ")
    }.mkString(", ")
    s"""WITH edges AS MATERIALIZED ($edgesSql),
      | nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
      | seeds AS (SELECT DISTINCT node FROM ($seedsSql)),
      | ns AS (SELECT count(*) AS n FROM seeds),
      | tnodes AS (SELECT nodes.node,
      |   CASE WHEN seeds.node IS NOT NULL THEN 1.0 / ns.n ELSE 0.0 END AS tele
      |  FROM nodes LEFT JOIN seeds ON seeds.node = nodes.node CROSS JOIN ns),
      | deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
      | r0 AS (SELECT node, tele AS rank FROM tnodes),
      | $steps
      | SELECT node, round(rank, 6) AS rank FROM r$iterations"""
      .stripMargin.replaceAll("\n", " ")
  }

  /** The identical computation as chained SQL CTEs (`r0 … rN`), one per
    * iteration — recursive-CTE dialects forbid aggregates in the recursive
    * term, so the oracle unrolls instead. `edgesSql` must yield distinct
    * (src, dst) rows. */
  def oracleSql(edgesSql: String, iterations: Int, damping: Double = 0.85): String = {
    val steps = (1 to iterations).map { i =>
      s"""r$i AS (SELECT n.node,
         | ${1 - damping} + $damping * coalesce(s.inflow, 0.0) AS rank
         | FROM nodes n LEFT JOIN (
         |  SELECT e.dst AS node, sum(r.rank / d.deg) AS inflow
         |  FROM edges e JOIN r${i - 1} r ON r.node = e.src
         |    JOIN deg d ON d.src = e.src
         |  GROUP BY e.dst) s ON s.node = n.node)"""
        .stripMargin.replaceAll("\n", " ")
    }.mkString(", ")
    s"""WITH edges AS ($edgesSql),
      | nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
      | deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
      | r0 AS (SELECT node, 1.0 AS rank FROM nodes),
      | $steps
      | SELECT node, round(rank, 6) AS rank FROM r$iterations"""
      .stripMargin.replaceAll("\n", " ")
  }
}
