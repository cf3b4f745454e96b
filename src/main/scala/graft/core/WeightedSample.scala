package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic weighted SYSTEMATIC sampling — the corpus-subsampling
  * step that draws ~`n` documents with inclusion probability proportional
  * to a weight (token budget, quality score) WITHOUT any RNG: lay every
  * document's weight end-to-end on the integer number line in doc_id
  * order (the [[SequencePack.prefixOffsets]] distributed prefix sum —
  * bucketed partials, a bounded driver scan of bucket totals, per-bucket
  * windows), then pick the documents whose weight interval crosses a
  * multiple of `step = total div n`. Classic systematic PPS (probability
  * proportional to size) selection: a document of weight w covers
  * `[start, start+w)` and is selected iff that interval contains a
  * multiple of `step`, i.e. `(start+w) div step > start div step` —
  * single integer division per row, no multiplication that could
  * overflow at a 100 TB total, no float anywhere, so the pick set is
  * byte-stable across runs, partitionings, AND engines (the oracle
  * replays the identical arithmetic). Sample size is `total div step`
  * (± the usual systematic-sampling rounding of the last stripe), and a
  * document with w ≥ step is always selected — the standard PPS
  * certainty-inclusion property.
  *
  * Versus the RNG alternatives: Efraimidis–Spirakis priority sampling
  * needs `u^(1/w)` floats whose cross-engine ordering is not exact, and
  * Bernoulli sampling gives a binomially-noisy sample size. Systematic
  * PPS is the one weighted scheme that is simultaneously exact-integer,
  * fixed-size, and single-pass — which is why it is the reproducible
  * choice for corpus subsampling.
  */
object WeightedSample {

  /** `(doc_id, w, start_offset, picked)` over `weighted (doc_id, w)`;
    * `picked` marks the ~`n` systematic selections. Zero-weight rows are
    * never picked (their interval is empty). When `total < n` every
    * positive-weight row is picked (`step` floors at 1). */
  def systematic(spark: SparkSession, weighted: DataFrame, n: Long,
      nBuckets: Int = 256): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val offsets = SequencePack.prefixOffsets(spark, weighted, nBuckets)
    val total = weighted.agg(coalesce(sum("w"), lit(0L))).head().getLong(0)
    val step = math.max(total / n, 1L)
    offsets.select(col("doc_id"), col("w"), col("start_offset"),
      (expr(s"(start_offset + w) div ${step}L") >
        expr(s"start_offset div ${step}L")).as("picked"))
  }
}
