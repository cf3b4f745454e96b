package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over an undirected edge list by iterative min-label
  * propagation on DataFrames (SURVEY.md §7 stage 3c — no GraphFrames jar is
  * shipped, so this is plain `join → groupBy(min)` to a fixpoint):
  *
  *   labels₀(v)   = v
  *   labelsᵢ₊₁(v) = min(labelsᵢ(v), min over neighbors u of labelsᵢ(u))
  *
  * Each iteration is one shuffle join + one aggregation;
  * `localCheckpoint` truncates lineage so plans stay bounded
  * (SURVEY.md §4 "explicit engineering"). Convergence needs at most
  * `diameter` iterations; real web-entity graphs have tiny diameters, and
  * `maxIter` bounds the pathological case. At cluster scale the same loop
  * runs unchanged — every step is a key-partitioned shuffle with partial
  * (map-side) min aggregation, no driver-side data.
  */
object ConnectedComponents {

  /** @param edges (src STRING, dst STRING) undirected edge list
    * @return (node STRING, component STRING) — component = min node label */
  def run(spark: SparkSession, edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    sym.count() // materialize once; reused every iteration

    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()

    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val fromNeighbors = sym
        .join(labels.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), col("label"), lit(0).as("is_old"))
      // the old label rides along in the SAME aggregation (tagged is_old=1,
      // unique per node), so the changed-check is a narrow scan of the
      // checkpointed round output — no extra join, no extra shuffle
      val next = fromNeighbors
        .union(labels.select(col("node"), col("label"), lit(1).as("is_old")))
        .groupBy("node")
        .agg(min("label").as("label"),
          min(when(col("is_old") === 1, col("label"))).as("old_label"))
        .localCheckpoint()
      val changed = next.filter(col("label") =!= col("old_label")).limit(1).count() > 0
      labels = next.select("node", "label")
      converged = !changed
      i += 1
    }
    sym.unpersist()
    labels.withColumnRenamed("label", "component")
  }

  /** Incremental connected components — the continuous-crawl shape: fold a
    * DELTA edge batch into an existing labeling without re-traversing the
    * landed graph. The old labeling is replayed as star edges
    * `(node → component)` and unioned with the delta; because every stored
    * component id IS the min node of its old component, min-label
    * propagation over the union yields exactly the labeling a full
    * recompute over (old ∪ delta) would — the invariant the q97 oracle
    * (full-graph recursive-CTE replay) and the OpsSpec equality case pin.
    *
    * Why this scales: the label edges are STARS (diameter ≤ 2 per old
    * component), so propagation converges in O(diameter of the DELTA
    * graph) rounds — the old graph's diameter is already compressed into
    * the stars. A crawl that lands 0.1% new edges per day re-labels in a
    * couple of rounds over |labels| + |delta| rows instead of re-running
    * CC over the full edge set. Singleton nodes ride along as self-stars
    * (`node → node`) and survive to the output. */
  def incremental(spark: SparkSession, oldLabels: DataFrame,
      deltaEdges: DataFrame, maxIter: Int = 25): DataFrame =
    run(spark,
      deltaEdges.select(col("src"), col("dst"))
        .union(oldLabels.select(col("node").as("src"), col("component").as("dst"))),
      maxIter)

  /** Alternating large-star / small-star connected components (Kiveris et
    * al., "Connected Components in MapReduce and Beyond", SoCC'14): each
    * round rewires every node toward its neighborhood minimum —
    *
    *   large-star: for every node u, connect each neighbor v > u to
    *               m(u) = min(Γ(u) ∪ {u});
    *   small-star: connect each neighbor v ≤ u (and u itself) to m(u)
    *               computed over the smaller neighbors.
    *
    * Converges in O(log²) rounds regardless of graph diameter — the scale
    * path for long-chain graphs where [[run]]'s min-label propagation would
    * need O(diameter) iterations. Output contract identical to [[run]]. */
  def runStar(spark: SparkSession, edges: DataFrame, maxIter: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window

    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
      .localCheckpoint()

    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("src").as("u"), col("dst").as("v"))
        .union(e.select(col("dst").as("u"), col("src").as("v"))).distinct()
      val w = Window.partitionBy("u")
      val withMin = sym.withColumn("m", least(min(col("v")).over(w), col("u")))
      withMin.filter(col("v") > col("u"))
        .select(col("v").as("src"), col("m").as("dst")).distinct()
    }

    def smallStar(e: DataFrame): DataFrame = {
      // orient every edge from the larger endpoint to the smaller
      val oriented = e.select(
        greatest(col("src"), col("dst")).as("u"),
        least(col("src"), col("dst")).as("v")).distinct()
      val w = Window.partitionBy("u")
      val withMin = oriented.withColumn("m", min(col("v")).over(w))
      withMin.select(col("v").as("src"), col("m").as("dst"))
        .union(withMin.select(col("u").as("src"), col("m").as("dst")))
        .filter(col("src") =!= col("dst"))
        .distinct()
    }

    // fixpoint detection by edge-set signature: both sides of the compare
    // are distinct sets, so (count, XOR of 64-bit row hashes) equality
    // detects set equality up to a ~2⁻⁶⁴ collision — ONE tiny aggregation
    // per round instead of the former two exceptAll anti-join passes
    // (2 shuffles/round saved); XOR is overflow-free under ANSI mode and
    // order-independent. Cross-validated against union-find in OpsSpec.
    def signature(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        expr("bit_xor(xxhash64(src, dst))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var e = edges.select("src", "dst").filter(col("src") =!= col("dst")).distinct()
      .localCheckpoint()
    var prevSig = signature(e)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint()
      val nextSig = signature(next)
      e = next
      converged = nextSig == prevSig
      prevSig = nextSig
      i += 1
    }
    // at fixpoint every surviving edge points a node at its component min;
    // isolated component minima (and singleton inputs) label themselves
    nodes.join(e.select(col("src").as("node"), col("dst").as("component")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("component"), col("node")).as("component"))
  }
}
