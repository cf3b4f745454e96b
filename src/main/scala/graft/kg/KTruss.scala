package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** k-truss decomposition — the EDGE analog of [[KCore]]: iteratively
  * delete edges supported by fewer than k−2 triangles until every
  * survivor closes ≥ k−2 triangles inside the survivor set (Cohen '08,
  * the trusted-community definition; the standard distributed recipe is
  * round-based support-count-and-peel, e.g. Chen et al.'s
  * MapReduce/Graph-challenge formulations). On an entity co-mention
  * graph the truss is a STRICTLY stronger backbone than the k-core: a
  * star's hub survives a degree peel but none of its edges close a
  * single triangle, so corroboration-by-co-mention requires the truss,
  * not the core.
  *
  * Per round: enumerate closed triangles over the CURRENT edge set with
  * the [[Triangles.closedTriangles]] join shape (degree-oriented wedges
  * — each wedge materialized once from its lowest-(degree,id) apex —
  * then one closing-edge probe, broadcast under a measured gate),
  * explode each triangle into its 3 canonical edge credits, count
  * credits per edge (map-side combinable), and keep edges with
  * `support ≥ k−2`. The edge list only shrinks; per-round cost is
  * monotonically decreasing and dominated by the wedge join, exactly
  * the [[Triangles]] cost the orientation already caps at O(√E) wedges
  * per node. Rounds are data-dependent (deletions cascade), so each
  * round's survivor list is checkpointed — the [[KCore]] lineage
  * discipline — and the oriented list is rebuilt per round WITHOUT the
  * session-cache persist [[Triangles.orientedOf]] uses (a peel loop
  * would strand one dead cache entry per round; the checkpoint is the
  * loop-safe residency).
  *
  * The checkpoint here is an RDD hop ([[checkpointNoStats]]), NOT
  * `Dataset.localCheckpoint`: the Dataset form propagates the replaced
  * plan's ESTIMATED statistics into the new leaf, and this loop's
  * per-round plan multiplies three references to that leaf through
  * inner joins — so the estimate COMPOUNDS ~3× in digit count per
  * round (measured: 33 → 98 → 294 → 881 → 2644 → 7932 → 23796 digits
  * over rounds 1-7 at sf0.01), and by round ~15 the optimizer's
  * BigInteger size arithmetic (`InjectRuntimeFilter`'s broadcast
  * check) dominates wall time unboundedly. [[KCore]] never hits this
  * because LEFT-SEMI join stats take the left side's size (no
  * product); this loop's support join is inner, so it must break the
  * stats chain explicitly. The RDD-hop leaf reports the default
  * (unknown) size; AQE still sees exact runtime sizes per stage.
  */
object KTruss {

  /** Materialize `df` and truncate BOTH lineage and the estimated-stats
    * chain: localCheckpoint the row RDD, then rewrap it with only the
    * schema — the resulting leaf carries no origin statistics (see the
    * object doc for why `Dataset.localCheckpoint` must not be used in
    * this loop). */
  private def checkpointNoStats(spark: SparkSession, df: DataFrame)
      : DataFrame = {
    val rdd = df.rdd
    rdd.localCheckpoint()
    rdd.count() // materialize now, so the old lineage is never replayed
    spark.createDataFrame(rdd, df.schema)
  }

  /** The k-truss as `(u, v, support)` — support measured INSIDE the
    * truss — plus the peel-round count (so an external oracle can unroll
    * the exact computation, the [[KCore.oracleSql]] contract). Input:
    * canonical undirected edges (u < v, distinct). `k ≥ 3`: the 2-truss
    * is every edge and peels nothing. */
  def trussWithRounds(spark: SparkSession, canonical: DataFrame, k: Int,
      maxIter: Int = 200, maxBroadcastEdges: Long = 5000000L)
      : (DataFrame, Int) = {
    require(k >= 3, s"k must be >= 3, got $k")
    var edges = checkpointNoStats(spark, canonical.select("u", "v"))
    var nEdges = edges.count()
    var rounds = 0
    var converged = nEdges == 0L
    var supported = supportOf(edges, nEdges, maxBroadcastEdges)
    while (!converged && rounds < maxIter) {
      val next = checkpointNoStats(spark,
        supported.filter(col("support") >= k - 2).select("u", "v"))
      val nNext = next.count()
      rounds += 1
      converged = nNext == nEdges
      edges = next
      nEdges = nNext
      if (!converged) supported = supportOf(edges, nEdges, maxBroadcastEdges)
      if (nEdges == 0L) converged = true
    }
    require(converged,
      s"k-truss did not reach a fixpoint in $maxIter rounds ($nEdges edges live)")
    // at the fixpoint the last `supported` was computed over an edge set
    // identical to the survivors, so its filtered rows ARE the truss with
    // in-truss supports — no extra triangle enumeration needed
    val result =
      if (nEdges == 0L)
        edges.withColumn("support", lit(0L)).select("u", "v", "support")
      else supported.filter(col("support") >= k - 2)
    (result, rounds)
  }

  /** Per-edge triangle support `(u, v, support)` over a canonical edge
    * list; zero-support edges are INCLUDED (left join against the credit
    * stream) so the caller's `≥ k−2` filter is the single peel rule. */
  private def supportOf(edges: DataFrame, nEdges: Long,
      maxBroadcastEdges: Long): DataFrame = {
    // degree-oriented wedge enumeration, loop-local (checkpointed input,
    // no persist): a < b in (degree, id) order caps wedges at the apex
    val deg = edges.select(col("u").as("n"))
      .union(edges.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val oriented = edges
      .join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"), "u")
      .join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"), "v")
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("u"))
          .otherwise(col("v")).as("a"),
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("v"))
          .otherwise(col("u")).as("b"))
    val orientedCk = checkpointNoStats(edges.sparkSession, oriented)
    val e2 = orientedCk.select(col("a").as("b"), col("b").as("c"))
    val e3raw = orientedCk.select(col("a").as("a3"), col("b").as("c3"))
    val e3 = if (nEdges <= maxBroadcastEdges) broadcast(e3raw) else e3raw
    val tri = orientedCk.join(e2, "b")
      .join(e3, col("a") === col("a3") && col("c") === col("c3"))
      .select(col("a"), col("b"), col("c"))
    val credits = tri.select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .union(tri.select(least(col("a"), col("c")).as("u"),
        greatest(col("a"), col("c")).as("v")))
      .union(tri.select(least(col("b"), col("c")).as("u"),
        greatest(col("b"), col("c")).as("v")))
      .groupBy("u", "v").agg(count(lit(1)).as("support"))
    edges.join(credits, Seq("u", "v"), "left")
      .select(col("u"), col("v"),
        coalesce(col("support"), lit(0L)).as("support"))
  }

  /** DuckDB oracle: the identical peel unrolled `rounds` times over the
    * caller-supplied canonical-edge CTE body (columns u, v). Support is
    * replayed as the common-neighbor count through the symmetrized
    * adjacency — the orientation is an engine execution detail, not a
    * semantic one. MATERIALIZED per round for the same inlining-blowup
    * reason as [[KCore.oracleSql]]. */
  def oracleSql(edgesSql: String, k: Int, rounds: Int): String = {
    // set-based support: wedge join through the symmetrized adjacency
    // (count of common neighbors per surviving edge); zero-support edges
    // simply produce no group, and k−2 ≥ 1 peels them — the same rule.
    def suppSql(e: String): String =
      s"""SELECT e.u, e.v, count(*) AS support FROM $e e
         | JOIN sym_$e s1 ON s1.a = e.u
         | JOIN sym_$e s2 ON s2.a = e.v AND s2.b = s1.b
         | GROUP BY e.u, e.v""".stripMargin.replaceAll("\n", " ")
    val steps = (1 to rounds).map { i =>
      val prev = s"e${i - 1}"
      s"""sym_$prev AS MATERIALIZED (SELECT u AS a, v AS b FROM $prev
         |  UNION ALL SELECT v AS a, u AS b FROM $prev),
         | e$i AS MATERIALIZED (SELECT u, v FROM (${suppSql(prev)})
         |  WHERE support >= ${k - 2})"""
        .stripMargin.replaceAll("\n", " ")
    }.mkString(", ")
    val last = s"e$rounds"
    val chain = if (rounds == 0) "" else s", $steps"
    s"""WITH e0 AS MATERIALIZED ($edgesSql)$chain,
       | sym_$last AS MATERIALIZED (SELECT u AS a, v AS b FROM $last
       |  UNION ALL SELECT v AS a, u AS b FROM $last)
       | ${suppSql(last)}""".stripMargin.replaceAll("\n", " ")
  }
}
