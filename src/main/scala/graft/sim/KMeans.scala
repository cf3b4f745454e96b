package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lloyd's k-means over the embedding table with EXACT integer
  * arithmetic — the clustering complement of the ANN family
  * ([[Ann]]/[[Ivf]] retrieve neighbors; this partitions the space) and
  * the unsupervised counterpart of [[LabelCoherence]]'s label-anchored
  * audit. A corpus pipeline runs it for topic bucketing, stratified
  * eval splits over embedding space, and IVF-style coarse quantization.
  *
  * Determinism contract (the q135/q147 discipline, applied to floats):
  * every cell is quantized ONCE to a BIGINT — `round(v × 10⁴)` plus a
  * constant offset — and every downstream operand (squared distances,
  * centroid means) is integer, so results are bit-identical across
  * runs, partitionings, and engines. The offset keeps all values
  * positive: DuckDB's `//` floors while Spark's `DIV` truncates toward
  * zero, and the two agree exactly on non-negative operands — squared
  * distances are shift-invariant and centroid means shift with the
  * data, so the offset cancels everywhere except in that divergence it
  * exists to remove. Initialization is the k smallest `vec_id`s'
  * vectors (oracle-rederivable, RNG-free); assignment ties break by
  * the lexicographic `min(struct(dist2, cluster))`; a cluster that
  * empties keeps its previous centroid.
  *
  * Scale shape: the cell table is one narrow posexplode, persisted
  * once and re-read each round; centroids are k×dim rows — broadcast
  * by AQE in the assignment join — so each Lloyd round is one
  * broadcast join + two map-side-combinable aggregates, no shuffle of
  * the corpus beyond the per-vector key. Rounds are a FIXED small
  * constant: lineage is bounded by construction and the oracle unrolls
  * the same count. */
object KMeans {

  /** Offset added to every quantized cell — larger than any plausible
    * |cell|×10⁴, so all integer operands stay non-negative. */
  val Offset: Long = 10000000L

  /** `(vec_id, cluster, dist2)` after `rounds` Lloyd iterations with
    * `k` centroids; `cluster` is the 1-based rank of the seeding
    * vector, `dist2` the exact integer squared distance to the final
    * assigned centroid in offset-quantized units. */
  def assign(spark: SparkSession, embeddings: DataFrame, k: Int,
      rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, s"need k >= 1, rounds >= 1; got $k, $rounds")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val cells = embeddings
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("j", "v")))
      .select(col("vec_id"), col("j"),
        (round(col("v").cast("double") * 10000).cast("long") + Offset).as("vi"))
      .persist(lvl)
    val seeds = embeddings.select("vec_id").orderBy("vec_id").limit(k)
      .withColumn("cluster",
        row_number().over(Window.orderBy("vec_id")).cast("long"))
    var centroids = cells.join(seeds, "vec_id")
      .select(col("cluster"), col("j"), col("vi").as("ci"))
      .localCheckpoint()
    var assignment: DataFrame = null
    (1 to rounds).foreach { r =>
      assignment = cells.join(centroids, "j")
        .groupBy("vec_id", "cluster")
        .agg(sum((col("vi") - col("ci")) * (col("vi") - col("ci"))).as("d2"))
        .groupBy("vec_id")
        .agg(min(struct(col("d2"), col("cluster"))).as("m"))
        .select(col("vec_id"), col("m.cluster").as("cluster"),
          col("m.d2").as("dist2"))
        .localCheckpoint()
      if (r < rounds) {
        val means = cells.join(assignment.select("vec_id", "cluster"), "vec_id")
          .groupBy("cluster", "j")
          .agg(expr("sum(vi) DIV count(vi)").as("mi"))
        centroids = centroids
          .join(means, Seq("cluster", "j"), "left")
          .select(col("cluster"), col("j"),
            coalesce(col("mi"), col("ci")).as("ci"))
          .localCheckpoint()
      }
    }
    assignment
  }
}
