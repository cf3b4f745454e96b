package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bounded-hop BFS over an undirected edge list — the traversal primitive
  * the graph family was missing beside components ([[ConnectedComponents]]),
  * centrality ([[PageRank]]), and density ([[Triangles]]): "everything
  * within k hops of these entities" is the neighborhood query a KG serves
  * constantly (related-entity panels, blast-radius of an edit, subgraph
  * extraction for a downstream model).
  *
  * Algorithm: frontier-relaxation with a visited set — each round joins
  * ONLY the newest frontier against the edge list, anti-joins out nodes
  * already reached (BFS reaches every node first at its minimal depth, so
  * a node never needs relaxing twice), and unions the survivors into the
  * visited set at `dist = round`. Work is Σ_rounds deg(frontier) ==
  * O(|E|) edge relaxations total for full traversals, and hop-bounded
  * traversals touch only the k-ball. The hop bound is a FIXED small k —
  * the iteration count is data-independent, so lineage depth is bounded
  * by construction; only the per-level frontiers and the edge list are
  * persisted (every one re-read by later rounds), never the cumulative
  * union, which is a free re-concatenation of cached levels.
  *
  * Joins are left to Catalyst/AQE: the frontier starts tiny (seed set)
  * and AQE broadcasts it while it fits, switching to shuffled joins if a
  * hop explodes — exactly the adaptive behavior a hand-forced broadcast
  * would break at web scale. The symmetric edge list is persisted once
  * (referenced every round under different join values — the
  * multiply-referenced-subplan rule).
  */
object Bfs {

  /** `(node, dist)` for every node within `maxHops` of `seeds` (a
    * single-column `node` DataFrame), dist = minimal hop count. Seeds are
    * dist 0. Input edges are canonical `(u, v)` undirected pairs
    * ([[Triangles.canonicalEdges]] shape — u < v, distinct). */
  def distances(spark: SparkSession, canonical: DataFrame, seeds: DataFrame,
      maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // persist exactly the MULTIPLY-REFERENCED frames: the edge list (one
    // join per round) and each level (anti-joined and unioned this round,
    // then referenced through every later round's visited union). The
    // cumulative visited union itself is NOT persisted — it is a bare
    // union of already-cached levels, free to re-concatenate — so no
    // dead snapshot ever enters the cache. Entries live in the session
    // cache (CacheManager dedups identical plans, so repeated identical
    // traversals share them rather than accumulate); sessions traversing
    // many distinct graphs should clearCache between corpora — the same
    // residency contract as [[Triangles.count]].
    val sym = canonical.select(col("u"), col("v"))
      .union(canonical.select(col("v").as("u"), col("u").as("v")))
      .persist(lvl)
    var visited = seeds.select(col("node"), lit(0L).as("dist")).persist(lvl)
    var frontier = visited
    (1 to maxHops).foreach { d =>
      val next = sym
        .join(frontier.withColumnRenamed("node", "u"), "u")
        .select(col("v").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .select(col("node"), lit(d.toLong).as("dist"))
        .persist(lvl)
      visited = visited.unionByName(next)
      frontier = next
    }
    visited
  }
}
