package graft.kg

import graft.core.Buckets
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maximal independent set by Luby's algorithm with DETERMINISTIC
  * priorities — the symmetry-breaking primitive under distributed
  * coloring, scheduling, and landmark selection (Luby SICOMP'86
  * randomized; here the "random" priority is the shared md5 primitive,
  * so every round replays on any engine — the [[RandomWalks]]
  * determinism contract applied to a fixpoint).
  *
  * Priority: `pk = md5(node) mod (10⁹+7) · 2³¹ + node` — the salt
  * breaks ties and the node-id tail makes `pk` globally DISTINCT (ids
  * must fit 31 bits — web-entity dictionaries and TPC-H keys do; wider
  * ids would take a second md5 limb). Per round, every active node
  * whose pk is strictly below every ACTIVE neighbor's pk joins the
  * set (a local minimum exists in any nonempty graph, so progress is
  * guaranteed); winners and their neighbors retire. Expected rounds
  * are O(log n) under hash-uniform priorities; the loop requires
  * completion within `maxRounds` and FAILS rather than returning a
  * non-maximal set.
  *
  * Scale shape: each round is two node-keyed joins restricting the
  * edge list to active endpoints, one map-side-combinable min per
  * node, and two anti-joins; the active set is localCheckpointed per
  * round (eager — also the emptiness probe), the symmetric edge list
  * persisted once. The round count is returned for the q73/q148
  * memo contract: the oracle unrolls exactly the measured rounds. */
object Mis {

  private[kg] def pk(node: org.apache.spark.sql.Column) =
    // ids outside [0, 2^31) would overflow/collide the priority and
    // surface as confusing non-convergence far from the cause — enforce
    // the documented 31-bit contract per row, zero extra jobs
    Buckets.md5Bucket(node, 1000000007) * 2147483648L +
      when(node < 0 || node >= 2147483648L, raise_error(concat(
        lit("Mis.pk: node id outside [0, 2^31) — 31-bit contract: "),
        node.cast("string"))).cast("long"))
      .otherwise(node)

  /** `((node, in_mis), rounds)` over the canonical undirected graph —
    * `in_mis` partitions nodes into the independent set and its
    * dominated complement. */
  def misWithRounds(spark: SparkSession, canonical: DataFrame,
      maxRounds: Int = 64): (DataFrame, Int) = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val sym = canonical.select(col("u"), col("v"))
      .union(canonical.select(col("v").as("u"), col("u").as("v")))
      .persist(lvl)
    val nodes = sym.select(col("u").as("node")).distinct()
      .localCheckpoint()
    var active = nodes.withColumn("p", pk(col("node"))).localCheckpoint()
    var mis = nodes.limit(0).localCheckpoint()
    var rounds = 0
    while (!active.isEmpty && rounds < maxRounds) {
      val nbrMin = sym
        .join(active.select(col("node").as("u")), "u")
        .join(active.select(col("node").as("v"), col("p").as("vp")), "v")
        .groupBy(col("u").as("node")).agg(min(col("vp")).as("nm"))
      val winners = active.join(nbrMin, Seq("node"), "left")
        .filter(col("nm").isNull || col("p") < col("nm"))
        .select("node").localCheckpoint()
      mis = mis.unionByName(winners).localCheckpoint()
      val retired = winners.unionByName(
        sym.join(winners.withColumnRenamed("node", "u"), "u")
          .select(col("v").as("node"))).distinct()
      active = active.join(retired, Seq("node"), "left_anti")
        .localCheckpoint()
      rounds += 1
    }
    require(active.isEmpty,
      s"MIS did not converge within $maxRounds rounds")
    val out = nodes
      .join(mis.withColumn("in_mis", lit(true)), Seq("node"), "left")
      .select(col("node"), coalesce(col("in_mis"), lit(false)).as("in_mis"))
    (out, rounds)
  }

  /** DuckDB oracle: the measured `rounds` unrolled over a canonical-
    * edge CTE body (columns u, v) with the identical pk arithmetic. */
  def oracleSql(edgesSql: String, rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      val prev = s"a${i - 1}"
      s"""w$i AS MATERIALIZED (SELECT a.node FROM $prev a
         | LEFT JOIN (SELECT e.u AS node, min(b.p) AS nm FROM sym e
         |    JOIN $prev x ON x.node = e.u JOIN $prev b ON b.node = e.v
         |    GROUP BY e.u) m ON m.node = a.node
         | WHERE m.nm IS NULL OR a.p < m.nm),
         | a$i AS MATERIALIZED (SELECT a.node, a.p FROM $prev a
         |  WHERE a.node NOT IN (SELECT node FROM w$i)
         |   AND a.node NOT IN (SELECT e.v FROM sym e
         |    JOIN w$i w ON w.node = e.u))"""
        .stripMargin.replaceAll("\n", " ")
    }.mkString(", ")
    val misUnion = (1 to rounds).map(i => s"SELECT node FROM w$i")
      .mkString(" UNION ALL ")
    val misSrc = if (rounds == 0) "SELECT NULL::BIGINT AS node WHERE false"
      else misUnion
    val chain = if (rounds == 0) "" else s", $steps"
    s"""WITH ce AS MATERIALIZED ($edgesSql),
       | sym AS MATERIALIZED (SELECT u, v FROM ce
       |  UNION ALL SELECT v AS u, u AS v FROM ce),
       | nodes AS MATERIALIZED (SELECT DISTINCT u AS node FROM sym),
       | a0 AS MATERIALIZED (SELECT node,
       |   ('0x' || substr(md5(node::varchar), 1, 8))::BIGINT % 1000000007
       |    * 2147483648 + node AS p FROM nodes)$chain,
       | mis AS (SELECT DISTINCT node FROM ($misSrc))
       | SELECT n.node, (m.node IS NOT NULL) AS in_mis
       | FROM nodes n LEFT JOIN mis m ON m.node = n.node"""
      .stripMargin.replaceAll("\n", " ")
  }
}
