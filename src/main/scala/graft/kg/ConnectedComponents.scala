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
        .select(col("dst").as("node"), col("label"))
      val next = fromNeighbors.union(labels)
        .groupBy("node").agg(min("label").as("label"))
        .localCheckpoint()
      val changed = next.withColumnRenamed("label", "next_label")
        .join(labels, "node")
        .filter(col("next_label") =!= col("label"))
        .limit(1).count() > 0
      labels = next
      converged = !changed
      i += 1
    }
    sym.unpersist()
    labels.withColumnRenamed("label", "component")
  }
}
