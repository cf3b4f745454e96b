package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Train/eval decontamination — the overlap check every training-data
  * pipeline runs before shipping a corpus: an eval document that shares
  * enough word n-grams with any training document leaks the benchmark
  * into the training set (the standard n-gram-overlap protocol popularized
  * by the GPT-3/PaLM/Llama decontamination appendices; the reference has
  * no notion of splits at all — its corpora ARE the eval).
  *
  * Shape: per-doc DISTINCT word 3-grams → 48-bit fingerprints → inner join
  * eval-side × train-side on the fingerprint → count distinct shared grams
  * per (eval, train) pair → threshold. Joining on a FIXED-WIDTH HASH
  * rather than the gram string is the scale decision: the exchange carries
  * 8-byte keys instead of arbitrary-length text (the same trick as the
  * MinHash banding slim-down), at a ~2⁻⁴⁸ per-pair collision rate — and
  * because the oracle uses the identical md5-prefix primitive, a collision
  * changes both sides the same way and the comparison stays exact. The
  * join fans out per shared gram; the n_shared ≥ k threshold bounds the
  * output, and the per-doc `array_distinct` bounds the fan-out at
  * doc-length per side (no quadratic blowup within a document).
  */
object Decontam {

  /** 48-bit md5-prefix fingerprint of a gram — shared with the DuckDB
    * oracle (`('0x' || substr(md5(g), 1, 12))::BIGINT`). */
  private def gramHash(g: Column): Column =
    conv(substring(md5(g), 1, 12), 16, 10).cast("long")

  /** `(doc_id, gram_hash)` — one row per distinct word 3-gram per doc.
    * Docs with fewer than 3 tokens emit nothing.
    *
    * Built from nested `zip_with` over three shifted slices rather than
    * `transform(sequence(...), i -> element_at(toks, i+k))`: a lambda body
    * re-evaluates its free expressions PER ELEMENT, so the element_at form
    * re-ran the regex tokenizer 3× per gram (O(len²) work per doc — it
    * benched 11 s at sf0.1); zip_with's argument slices evaluate the
    * tokenizer O(1) times per row (the q48 repetition-signal pattern). */
  def gramFingerprints(docs: DataFrame): DataFrame = {
    val toks = split(trim(col("text")), "\\s+")
    val n = size(toks)
    val g2 = zip_with(slice(toks, lit(1), n - 2), slice(toks, lit(2), n - 2),
      (a, b) => concat(a, lit(" "), b))
    val grams = zip_with(g2, slice(toks, lit(3), n - 2),
      (ab, c) => concat(ab, lit(" "), c))
    docs
      .filter(n >= 3)
      .select(col("doc_id"), explode(array_distinct(grams)).as("g"))
      .select(col("doc_id"), gramHash(col("g")).as("gh"))
  }

  /** Contaminated `(eval_doc, train_doc, n_shared)` pairs: eval docs
    * sharing at least `minShared` distinct 3-grams with a train doc. */
  def contaminatedPairs(train: DataFrame, eval: DataFrame,
      minShared: Long): DataFrame = {
    val tr = gramFingerprints(train).withColumnRenamed("doc_id", "train_doc")
    val ev = gramFingerprints(eval).withColumnRenamed("doc_id", "eval_doc")
    ev.join(tr, "gh")
      .groupBy("eval_doc", "train_doc")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
