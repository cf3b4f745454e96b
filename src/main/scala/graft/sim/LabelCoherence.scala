package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Labeled-embedding coherence audit: per label, the k vectors LEAST
  * cosine-similar to their own label's centroid — the embedding-space
  * mislabeled-candidate detector (the centroid-distance instance of
  * confident-learning-style label QA; Northcutt, Jiang & Chuang, "
  * Confident Learning", JAIR 2021 formalizes why low-agreement examples
  * are the re-annotation queue). A training-data pipeline runs this
  * after every labeling pass: the bottom-k per class IS the audit
  * worklist, sized for human review.
  */
object LabelCoherence {

  /** `(label, rnk, vec_id, cos_sim)` for the `k` lowest-similarity
    * vectors per label, rank 1 = most suspicious. Centroids are
    * per-dimension means ROUNDED to 4 before the cosine (the q87
    * cross-engine float discipline — both engines then fold identical
    * centroid operands), cosine rounded to 4 likewise; rank ties break
    * on `vec_id` so the worklist is deterministic.
    *
    * @param embeddings `(vec_id, embedding ARRAY<FLOAT>, label)` rows
    * @param k          audit worklist size per label
    *
    * Scale shape: one narrow posexplode to cells, a centroid aggregate
    * bounded by |labels| × dim (broadcast-joinable back onto the
    * cells), one map-side-combined per-(vec, label) aggregate folding
    * the three cosine sums, and a per-label bottom-k window that Spark
    * plans with `WindowGroupLimit` — map-side top-k per partition, so
    * a million-vector label never funnels through one task unfiltered
    * (the q126 cap discipline). */
  def outliers(embeddings: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"worklist size must be >= 1, got $k")
    val cells = embeddings
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("j", "v")))
      .select(col("vec_id"), col("label"), col("j"),
        col("v").cast("double").as("v"))
    val centroid = cells.groupBy("label", "j")
      .agg(round(avg(col("v")), 4).as("c"))
    val scored = cells.join(centroid, Seq("label", "j"))
      .groupBy("vec_id", "label")
      .agg(
        sum(col("v") * col("c")).as("dot"),
        sum(col("v") * col("v")).as("nv"),
        sum(col("c") * col("c")).as("nc"))
      .select(col("vec_id"), col("label"),
        round(col("dot") / (sqrt(col("nv")) * sqrt(col("nc"))), 4)
          .as("cos_sim"))
    val byCos = Window.partitionBy("label")
      .orderBy(col("cos_sim").asc, col("vec_id").asc)
    scored.withColumn("rnk", row_number().over(byCos))
      .filter(col("rnk") <= k)
      .select(col("label"), col("rnk"), col("vec_id"), col("cos_sim"))
  }
}
