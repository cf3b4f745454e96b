package graft.sim

import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text → vector via feature hashing (Weinberger et al. '09): token
  * term-frequencies scatter into a fixed-dim array at `md5(token) mod dim`
  * with a ±1 sign bit, then L2-normalize — the dependency-free way to give
  * every document an embedding so the similarity stack ([[Ann]], [[Ivf]],
  * `cosineNearDupPairs`) runs on raw text corpora with no model server.
  *
  * Hash primitives are the DuckDB-portable md5 forms ([[Dedup.md5Hash32]] /
  * [[Dedup.md5Hash64]]), so the oracle replays the whole vectorization.
  * Narrow map per doc, O(dim) state — no shuffle, no training.
  */
object TextVec {

  /** Dense hashed-TF vector of one text (rounded to 6 decimals AFTER
    * normalization so values survive engine↔oracle compare). */
  def vectorOf(text: String, dim: Int): Array[Double] = {
    val v = new Array[Double](dim)
    graft.text.PyStr.split(text).foreach { tok =>
      val idx = (Dedup.md5Hash32(tok) % dim).toInt
      val sgn = if ((Dedup.md5Hash64(tok) & 1L) == 1L) 1.0 else -1.0
      v(idx) += sgn
    }
    val n2 = math.sqrt(v.map(x => x * x).sum)
    // round half AWAY FROM ZERO — DuckDB's round() semantics (rint would
    // round half-even and diverge at exact .5e-6 boundaries)
    def r6(x: Double) = math.signum(x) * math.floor(math.abs(x) * 1e6 + 0.5) / 1e6
    if (n2 == 0) v else v.map(x => r6(x / n2))
  }

  /** `(doc_id, embedding ARRAY<DOUBLE>)` — the chaining form for
    * [[Ann]]/[[Ivf]] consumers. */
  def vectors(spark: SparkSession, docs: DataFrame, dim: Int): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) => (id, vectorOf(text, dim)) }
      .toDF("doc_id", "embedding")
  }

  /** Flattened `(doc_id, j, v)` form — scalar cells compare robustly in
    * external oracles (list-typed cells stringify differently per engine). */
  def flattened(spark: SparkSession, docs: DataFrame, dim: Int): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        vectorOf(text, dim).iterator.zipWithIndex.map { case (v, j) => (id, j, v) }
      }
      .toDF("doc_id", "j", "v")
  }
}
