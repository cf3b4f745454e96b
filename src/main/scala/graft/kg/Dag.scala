package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DAG layering — the topological depth assignment hierarchies need
  * before anything can be scheduled, rolled up, or rendered over them:
  * layer(v) = 0 for sources, else the length of the LONGEST incoming
  * path (critical-path depth). Equivalently the coarsest topological
  * level order: every edge goes from a strictly lower layer to a
  * strictly higher one, so per-layer processing (type hierarchies,
  * build graphs, entailment passes like q113's forward chaining) is
  * safe to parallelize within a layer.
  *
  * Algorithm: Bellman–Ford-style max-relaxation to fixpoint —
  * layer₀(v) = 0, layerᵢ₊₁(v) = max(layerᵢ(v), max over in-edges
  * (u,v) of layerᵢ(u) + 1). Each round is ONE equi-join plus one
  * map-side-combinable max aggregate; the old layer rides the same
  * aggregate (the [[ConnectedComponents.run]] changed-check discipline)
  * so convergence costs a narrow scan, not an extra join. Converges in
  * exactly `longest path length` rounds on a DAG.
  *
  * Cycle audit for free: on a cyclic input the relaxation strictly
  * grows some node's layer EVERY round (max over a cycle keeps
  * feeding itself +1), so non-convergence within `maxDepth` rounds is
  * the cycle detector — the operator REFUSES with the offending nodes'
  * candidate layers still growing rather than silently emitting a
  * partial order. Callers with legitimately deeper DAGs raise
  * `maxDepth`; callers wanting the cycle set run [[Scc]] and condense
  * first — the standard pairing.
  */
object Dag {

  /** @param edges (src, dst) directed edge list, any key type
    * @param maxDepth refuse (as a cycle) past this many relaxation rounds
    * @return (node, layer) — layer = longest incoming path length */
  def longestPathLayers(spark: SparkSession, edges: DataFrame,
      maxDepth: Int = 100): DataFrame = {
    val e = edges.select("src", "dst").distinct().localCheckpoint()
    var lvl = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .withColumn("layer", lit(0L)).localCheckpoint()
    var converged = false
    var i = 0
    while (!converged) {
      require(i < maxDepth,
        s"layer relaxation still growing after $maxDepth rounds — " +
          "the graph has a directed cycle (or raise maxDepth)")
      val next = e.join(lvl.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), (col("layer") + 1L).as("layer"),
          lit(0).as("is_old"))
        .union(lvl.select(col("node"), col("layer"), lit(1).as("is_old")))
        .groupBy("node")
        .agg(max("layer").as("layer"),
          max(when(col("is_old") === 1, col("layer"))).as("old_layer"))
        .localCheckpoint()
      converged = next.filter(col("layer") =!= col("old_layer"))
        .limit(1).count() == 0
      lvl = next.select("node", "layer")
      i += 1
    }
    lvl
  }
}
