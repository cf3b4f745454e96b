package graft.quality

import graft.sim.TextVec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the fastText/CCNet-style linear
  * classifier gate every production corpus ships (score each document with
  * a trained linear model over hashed bag-of-words features; keep above
  * threshold). The heavy half of that gate is the featurization, which is
  * [[TextVec]]'s hashed-TF (narrow, md5-portable, oracle-replayable); the
  * model itself is a weight vector of the feature dimension — broadcast by
  * construction (64–2²¹ floats), never a shuffle.
  *
  * The weights here are a fixed deterministic stand-in (`(j mod 7 − 3)/3`)
  * because training data for a real quality model isn't part of this
  * sandbox; the Spark-side shape — featurize, dot a broadcast weight
  * vector, sigmoid, threshold — is exactly the production one, and the
  * whole path (hashing included) replays in the external SQL oracle.
  */
object Classifier {

  /** Stand-in linear weights over `dim` hashed features. */
  def weight(j: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (j % 7 - lit(3)).cast("double") / 3.0

  /** `(doc_id, quality, keep)`: sigmoid of the hashed-TF dot product with
    * the weight vector, `keep = raw ≥ 0` (score ≥ 0.5). */
  def score(spark: SparkSession, docs: DataFrame, dim: Int): DataFrame = {
    val raw = TextVec.flattened(spark, docs, dim)
      .select(col("doc_id"), (col("v") * weight(col("j"))).as("t"))
      .groupBy("doc_id").agg(sum(col("t")).as("raw"))
    raw.select(col("doc_id"),
      round(lit(1.0) / (lit(1.0) + exp(-col("raw"))), 4).as("quality"),
      (col("raw") >= 0).as("keep"))
  }
}
