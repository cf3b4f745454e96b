package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bounded-hop WEIGHTED shortest paths from a seed set — the cost-aware
  * counterpart of [[Bfs]] (hop counts) and [[Landmarks]] (per-seed hop
  * frames): "which landmark is CHEAPEST to reach, and at what cost" is
  * the nearest-facility / Voronoi-partition query a KG serves for
  * routing-flavored analytics (closest hub, cheapest provenance chain,
  * weighted blast-radius).
  *
  * Algorithm: synchronized Bellman–Ford relaxation with a delta frontier.
  * `best` holds one row per reached node — the lexicographic minimum of
  * `(dist, seed)` over all relaxed paths, so ties on distance break to
  * the smallest seed and the result is total-order deterministic. Each
  * round relaxes ONLY the rows that improved last round (the classic
  * delta optimization: a node whose best didn't change cannot improve a
  * neighbor), merges candidates into `best` with one map-side-combinable
  * `min(struct(dist, seed))` aggregate, and early-exits on an exactly
  * empty improvement set. After r rounds `best` is the minimum over
  * paths of at most r edges — the synchronized-BF invariant — so the
  * `maxHops` bound gives the same path-length semantics as [[Bfs]] /
  * [[Landmarks]] and the oracle's bounded recursion replays it exactly.
  *
  * Scale shape: per round one frontier⋈edges join (AQE broadcasts the
  * frontier while it is small) + one key-partitioned aggregate; lineage
  * is truncated per round with eager `localCheckpoint`, and only the
  * symmetric edge list — referenced every round — is persisted. Rounds
  * are bounded by `maxHops` by construction, so plan depth cannot run
  * away on a pathological graph.
  */
object Sssp {

  /** `(node, dist, seed)` for every node within `maxHops` edges of some
    * seed: `dist` = minimum path weight over paths of ≤ `maxHops` edges,
    * `seed` = smallest seed achieving that minimum. Seeds are dist 0 of
    * themselves. Input edges are canonical weighted undirected triples
    * `(u, v, w)` with positive integer weights. */
  def nearestSeed(spark: SparkSession, weighted: DataFrame, seeds: DataFrame,
      maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val sym = weighted.select(col("u"), col("v"), col("w"))
      .union(weighted.select(col("v").as("u"), col("u").as("v"), col("w")))
      .persist(lvl)
    var best = seeds
      .select(col("node"), lit(0L).as("dist"), col("node").as("seed"))
      .localCheckpoint()
    var frontier = best
    var round = 0
    var converged = false
    while (round < maxHops && !converged) {
      val cand = sym
        .join(frontier.withColumnRenamed("node", "u"), "u")
        .select(col("v").as("node"), (col("dist") + col("w")).as("dist"),
          col("seed"))
      val merged = best.unionByName(cand)
        .groupBy("node").agg(min(struct(col("dist"), col("seed"))).as("m"))
        .select(col("node"), col("m.dist").as("dist"), col("m.seed").as("seed"))
        .localCheckpoint()
      // the delta frontier: nodes first reached, or reached cheaper (or
      // same cost from a smaller seed) than before
      val improved = merged
        .join(best.select(col("node"), col("dist").as("od"),
          col("seed").as("os")), Seq("node"), "left")
        .filter(col("od").isNull ||
          struct(col("dist"), col("seed")) < struct(col("od"), col("os")))
        .select("node", "dist", "seed")
        .localCheckpoint()
      converged = improved.isEmpty
      best = merged
      frontier = improved
      round += 1
    }
    best
  }

  /** The ROUTING TREE over [[nearestSeed]]'s distance frame:
    * `(node, dist, seed, parent)` where `parent` is the smallest
    * neighbor p with `dist(p) + w(p, node) = dist(node)` and
    * `seed(p) = seed(node)` — an arg-min predecessor of the semiring
    * fixpoint, so following parents strictly decreases `dist` (every
    * edge weight is positive) and terminates at the seed, whose own
    * parent is NULL (no neighbor can close a 0-cost hop). The
    * materialized next-hop table a path-serving layer reads instead of
    * re-traversing per query.
    *
    * Scale shape: [[nearestSeed]] plus ONE edge⋈frame join, one
    * map-side-combinable min, and one left join back — no iteration
    * beyond the distance fixpoint itself. */
  def routingTree(spark: SparkSession, weighted: DataFrame, seeds: DataFrame,
      maxHops: Int): DataFrame = {
    val best = nearestSeed(spark, weighted, seeds, maxHops)
    val sym = weighted.select(col("u"), col("v"), col("w"))
      .union(weighted.select(col("v").as("u"), col("u").as("v"), col("w")))
    val parents = sym
      .join(best.select(col("node").as("u"), col("dist").as("pd"),
        col("seed").as("ps")), "u")
      .join(best.select(col("node").as("v"), col("dist"), col("seed")), "v")
      .filter(col("pd") + col("w") === col("dist") &&
        col("ps") === col("seed"))
      .groupBy(col("v").as("node"))
      .agg(min(col("u")).as("parent"))
    best.join(parents, Seq("node"), "left")
      .select(col("node"), col("dist"), col("seed"), col("parent"))
  }
}
