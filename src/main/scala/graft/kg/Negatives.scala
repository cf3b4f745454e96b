package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic negative sampling for KG-embedding training — the data
  * generator behind TransE/DistMult-style training (Bordes et al. '13):
  * for every positive triple, emit a corrupted copy whose subject is
  * swapped for a different entity drawn pseudo-randomly from the entity
  * vocabulary. Production trainers need this sampling to be (a) uniform
  * over the vocabulary, (b) never equal to the true subject, and
  * (c) DETERMINISTIC — re-running the corpus job must regenerate the same
  * negatives, or training becomes unreproducible and resume impossible.
  *
  * Determinism comes from the same md5 primitive as the corpus split /
  * sample / decontamination family ([[graft.core.Buckets]] pattern): the
  * offset into the vocabulary is `md5(subj|pred|obj) mod (V−1) + 1`, which
  * is ≥1 and ≤V−1, so `(idx + offset) mod V ≠ idx` by construction — the
  * no-collision guarantee needs no retry loop.
  *
  * Scale shape: the vocabulary index (`entity → rank`) uses one global
  * row_number window — legitimate ONLY because the entity vocabulary is
  * orders of magnitude smaller than the triple stream (dictionary- to
  * millions-sized, never corpus-sized); it then joins back into the
  * triple stream twice (rank lookup, reverse lookup), both
  * vocabulary-sized sides that AQE broadcast-plans. The triple stream
  * itself stays narrow — one md5 map, two small joins, no corpus shuffle.
  */
object Negatives {

  /** `(subj, pred, obj, neg_subj)` — one corrupted-subject negative per
    * input triple. `triples` must have string columns subj, pred, obj. */
  def corruptSubject(spark: SparkSession, triples: DataFrame): DataFrame = {
    val vocab = triples.select(col("subj").as("ent")).distinct()
      .withColumn("idx",
        row_number().over(org.apache.spark.sql.expressions.Window.orderBy("ent"))
          .cast("long") - 1)
    val v = vocab.count()
    require(v >= 2, s"need >= 2 distinct subjects to corrupt, got $v")
    val key = concat_ws("|", col("subj"), col("pred"), col("obj"))
    val offset = conv(substring(md5(key), 1, 8), 16, 10).cast("long") % (v - 1) + 1
    triples
      .join(vocab.select(col("ent").as("subj"), col("idx")), "subj")
      .withColumn("neg_idx", (col("idx") + offset) % v)
      .join(vocab.select(col("idx").as("neg_idx"), col("ent").as("neg_subj")),
        "neg_idx")
      .select("subj", "pred", "obj", "neg_subj")
  }
}
