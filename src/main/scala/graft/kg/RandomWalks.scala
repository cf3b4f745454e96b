package graft.kg

import graft.core.Buckets
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic random-walk corpus generation — the DeepWalk/node2vec
  * preprocessing step (Perozzi et al. '14): emit fixed-length walks from
  * every node; the walk corpus then trains skip-gram entity embeddings
  * exactly like a text corpus trains word vectors.
  *
  * Production walk generation must be DETERMINISTIC (re-running the prep
  * job must regenerate the identical corpus or embedding training is
  * unreproducible — the same requirement as [[Negatives]]): the "random"
  * neighbor choice at step s of walk w is
  * `md5(walk_id|s) mod deg(cur)` over the node's ascending-sorted
  * neighbor list — the shared [[Buckets]] primitive, so an external SQL
  * oracle replays every choice. (The mod is pseudo-uniform with the
  * usual ≤1-part-in-2³² modulo bias — irrelevant for corpus generation.)
  *
  * Scale shape: the neighbor INDEX relation is built once — a
  * `row_number` window partitioned by node (one graph-sized shuffle) —
  * and each of the fixed `steps` rounds is two joins of the walk
  * frontier (|V|·walksPerNode rows, tiny next to the edge list) against
  * the persisted degree/index relations; AQE broadcast-plans the
  * frontier side when it measures small. Plan depth is 2·steps joins —
  * bounded by construction, no checkpoint needed (same argument as the
  * fixed-k [[Bfs]] loop).
  */
object RandomWalks {

  /** `(walk_id, path)` — `walksPerNode` walks of `steps` hops from every
    * node; `path` is the `->`-joined node sequence (steps+1 nodes),
    * `walk_id = node · walksPerNode + replica`.
    *
    * @param canonical [[Triangles.canonicalEdges]] shape (u<v, distinct)
    */
  def walks(spark: SparkSession, canonical: DataFrame, walksPerNode: Int,
      steps: Int): DataFrame = {
    require(walksPerNode >= 1 && steps >= 1,
      s"need walksPerNode/steps >= 1, got $walksPerNode/$steps")
    val und = canonical.select(col("u").as("w"), col("v").as("n"))
      .union(canonical.select(col("v").as("w"), col("u").as("n")))
    // Adjacency as ONE ascending-sorted array per node:
    // `element_at(ns, idx+1)` is definitionally the neighbor the old
    // (row_number−1 = idx) relation row held, so each step joins the
    // walk frontier against a NODE-count-sized relation instead of an
    // EDGE-count-sized one, the per-node sort window disappears, and
    // the degree is `size(ns)` (measured q86 4.8 → ~2 s at sf0.1,
    // OPTIMIZATION_r06). Buffer hazard gate: a collect_list buffer is
    // O(degree); above `maxArrayDegree` (one cheap measured aggregate)
    // fall back to the exploded-relation join, which buffers nothing.
    val maxArrayDegree = 4000000L
    val maxDeg = und.groupBy("w").agg(count(lit(1)).as("d"))
      .agg(coalesce(max(col("d")), lit(0L))).head().getLong(0)
    if (maxDeg <= maxArrayDegree) {
      val adj = und.groupBy(col("w"))
        .agg(sort_array(collect_list(col("n"))).as("ns"))
        .persist()
      var frontier = adj
        .select(col("w").as("cur"),
          explode(sequence(lit(0), lit(walksPerNode - 1))).as("r"))
        .select((col("cur") * walksPerNode + col("r")).as("walk_id"),
          col("cur"), col("cur").cast("string").as("path"))
      for (step <- 1 to steps) {
        val nxt = element_at(col("ns"), (Buckets.md5Bucket(
          concat_ws("|", col("walk_id"), lit(step)), size(col("ns")))
          + 1).cast("int"))
        frontier = frontier
          .join(adj, frontier("cur") === adj("w"))
          .select(col("walk_id"), nxt.as("cur"),
            concat(col("path"), lit("->"), nxt.cast("string")).as("path"))
      }
      frontier.select(col("walk_id"), col("path"))
    } else {
      val deg = und.groupBy("w").agg(count(lit(1)).as("d")).persist()
      val nbr = und.withColumn("idx",
          row_number().over(Window.partitionBy("w").orderBy("n")) - 1)
        .select(col("w").as("nw"), col("idx").as("nidx"), col("n").as("nxt"))
        .persist()
      var frontier = deg
        .select(col("w").as("cur"),
          explode(sequence(lit(0), lit(walksPerNode - 1))).as("r"))
        .select((col("cur") * walksPerNode + col("r")).as("walk_id"),
          col("cur"), col("cur").cast("string").as("path"))
      for (step <- 1 to steps) {
        val choice = frontier.join(deg, frontier("cur") === deg("w"))
          .withColumn("idx",
            Buckets.md5Bucket(concat_ws("|", col("walk_id"), lit(step)), col("d")))
        frontier = choice
          .join(nbr, choice("cur") === nbr("nw") && choice("idx") === nbr("nidx"))
          .select(col("walk_id"), col("nxt").as("cur"),
            concat(col("path"), lit("->"), col("nxt").cast("string")).as("path"))
      }
      frontier.select(col("walk_id"), col("path"))
    }
  }

  /** DuckDB oracle: the identical walk unrolled `steps` times over the
    * caller-supplied canonical-edge CTE body (columns u, v). */
  def oracleSql(edgesSql: String, walksPerNode: Int, steps: Int): String = {
    val rounds = (1 to steps).map { s =>
      val prev = s"w${s - 1}"
      s"""w$s AS (SELECT walk_id, nbr.n AS cur, path || '->' || nbr.n AS path
         | FROM $prev JOIN deg ON deg.w = $prev.cur
         | JOIN nbr ON nbr.w = $prev.cur AND nbr.idx =
         |   (('0x' || substr(md5(walk_id || '|' || $s), 1, 8))::BIGINT % deg.d))"""
        .stripMargin.replaceAll("\n", " ")
    }.mkString(", ")
    s"""WITH edges AS MATERIALIZED ($edgesSql),
       | und AS MATERIALIZED (SELECT u AS w, v AS n FROM edges
       |   UNION ALL SELECT v AS w, u AS n FROM edges),
       | deg AS MATERIALIZED (SELECT w, count(*) AS d FROM und GROUP BY w),
       | nbr AS MATERIALIZED (SELECT w, n,
       |   row_number() OVER (PARTITION BY w ORDER BY n) - 1 AS idx FROM und),
       | w0 AS (SELECT dw.w * $walksPerNode + g.j AS walk_id, dw.w AS cur,
       |   dw.w::varchar AS path
       |  FROM deg dw CROSS JOIN generate_series(0, ${walksPerNode - 1}) g(j)),
       | $rounds
       | SELECT walk_id, path FROM w$steps""".stripMargin.replaceAll("\n", " ")
  }

  /** WEIGHT-BIASED deterministic walks — node2vec's weighted-graph
    * regime: at each step the neighbor is drawn with probability
    * ∝ edge weight by INVERSE-CDF over the neighbor list's cumulative
    * weights (each neighbor owns the half-open interval
    * `[cumw − w, cumw)` of `[0, totw)`; the md5 draw
    * `md5(walk_id|step) mod totw` picks the interval it lands in —
    * the [[graft.core.Buckets]] primitive over the q146 prefix-sum
    * discipline, applied per adjacency list). Same determinism
    * contract as [[walks]]: every choice replays on any engine.
    *
    * Scale shape: the cumulative-weight relation is ONE window
    * partitioned by node (adjacency-list sized frames), built once and
    * persisted; each fixed step is two frontier joins. Integer weights
    * only — the draw and every interval bound are exact BIGINTs. */
  def weightedWalks(spark: SparkSession, weighted: DataFrame,
      walksPerNode: Int, steps: Int): DataFrame = {
    require(walksPerNode >= 1 && steps >= 1,
      s"need walksPerNode/steps >= 1, got $walksPerNode/$steps")
    val und = weighted.select(col("u").as("nw"), col("v").as("n"), col("w"))
      .union(weighted.select(col("v").as("nw"), col("u").as("n"), col("w")))
    val cum = und.withColumn("cumw",
        sum("w").over(Window.partitionBy("nw").orderBy("n")))
      .persist()
    val tot = und.groupBy("nw").agg(sum("w").as("tw"))
      .select(col("nw").as("tn"), col("tw")).persist()
    var frontier = tot
      .select(col("tn").as("cur"),
        explode(sequence(lit(0), lit(walksPerNode - 1))).as("r"))
      .select((col("cur") * walksPerNode + col("r")).as("walk_id"),
        col("cur"), col("cur").cast("string").as("path"))
    for (step <- 1 to steps) {
      val choice = frontier.join(tot, frontier("cur") === col("tn"))
        .withColumn("pick", Buckets.md5Bucket(
          concat_ws("|", col("walk_id"), lit(step)), col("tw")))
      frontier = choice
        .join(cum, choice("cur") === cum("nw") &&
          choice("pick") >= cum("cumw") - cum("w") &&
          choice("pick") < cum("cumw"))
        .select(col("walk_id"), col("n").as("cur"),
          concat(col("path"), lit("->"), col("n").cast("string")).as("path"))
    }
    frontier.select(col("walk_id"), col("path"))
  }

  /** DuckDB oracle for [[weightedWalks]] over a weighted-edge CTE body
    * (columns u, v, w). */
  def weightedOracleSql(edgesSql: String, walksPerNode: Int,
      steps: Int): String = {
    val rounds = (1 to steps).map { s =>
      val prev = s"w${s - 1}"
      s"""w$s AS (SELECT walk_id, c.n AS cur, path || '->' || c.n AS path
         | FROM $prev JOIN tot ON tot.nw = $prev.cur
         | JOIN cum c ON c.nw = $prev.cur
         |  AND (('0x' || substr(md5(walk_id || '|' || $s), 1, 8))::BIGINT
         |    % tot.tw) >= c.cumw - c.w
         |  AND (('0x' || substr(md5(walk_id || '|' || $s), 1, 8))::BIGINT
         |    % tot.tw) < c.cumw)"""
        .stripMargin.replaceAll("\n", " ")
    }.mkString(", ")
    s"""WITH wedges AS MATERIALIZED ($edgesSql),
       | wund AS MATERIALIZED (SELECT u AS nw, v AS n, w FROM wedges
       |   UNION ALL SELECT v AS nw, u AS n, w FROM wedges),
       | cum AS MATERIALIZED (SELECT nw, n, w,
       |   sum(w) OVER (PARTITION BY nw ORDER BY n) AS cumw FROM wund),
       | tot AS MATERIALIZED (SELECT nw, sum(w) AS tw FROM wund GROUP BY nw),
       | w0 AS (SELECT t.nw * $walksPerNode + g.j AS walk_id, t.nw AS cur,
       |   t.nw::varchar AS path
       |  FROM tot t CROSS JOIN generate_series(0, ${walksPerNode - 1}) g(j)),
       | $rounds
       | SELECT walk_id, path FROM w$steps""".stripMargin.replaceAll("\n", " ")
  }
}
