package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity co-occurrence PMI — the statistical relation-proposal step of a
  * KG-construction pipeline (Church & Hanks '90 pointwise mutual
  * information over co-mention counts). The reference emits only
  * dictionary-derived triples (ai/ner.py's category→predicate map); a
  * production KG builder additionally PROPOSES candidate relations between
  * entity pairs that co-occur on the same page more often than chance, and
  * PMI is the standard score for that proposal list.
  *
  * Scale shape: the input is the linked `(doc_id, entity_id)` relation.
  * Pair generation never self-joins the corpus-sized relation — it
  * aggregates each document's entity set into one (dictionary-bounded)
  * sorted array with a single map-side-combined groupBy, then explodes the
  * per-document pairs with `posexplode`+`slice` (pure Catalyst, codegen'd,
  * no UDF). Per-document fan-out is k·(k−1)/2 with k ≤ |dictionary| — a
  * per-row constant, so the pair stream is O(corpus), never O(corpus²).
  * The marginal counts relation is entity-vocabulary-sized and joins back
  * via broadcast (AQE picks it from measured size); the only wide stages
  * are the two hash aggregations, both keyed by doc/pair keys that
  * hot-entity skew cannot concentrate (the per-pair aggregate's hottest
  * key carries at most one row per document).
  */
object Cooccur {

  /** PMI-scored co-occurring entity pairs.
    *
    * @param linked distinct-able `(doc_id, entity_id)` mention-link rows
    * @param nDocs  corpus size (the PMI normalizer) — a measured scalar
    * @return `(e1, e2, n_pair, pmi)` with `e1 < e2`,
    *         `pmi = ln(n_pair·N / (c₁·c₂))` rounded to 4 decimals
    */
  def entityPmi(linked: DataFrame, nDocs: Long): DataFrame = {
    val ent = linked.select(col("doc_id"), col("entity_id")).distinct()
    // one array per doc; sort_array makes pair order (e1 < e2) positional
    val lists = ent.groupBy("doc_id")
      .agg(sort_array(collect_set(col("entity_id"))).as("es"))
    val pairs = lists
      .select(posexplode(col("es")).as(Seq("i", "e1")), col("es"))
      // slice is 1-based: elements strictly after position i (0-based e1)
      .select(col("e1"), explode(slice(col("es"), col("i") + 2, size(col("es")))).as("e2"))
      .groupBy("e1", "e2").agg(count(lit(1)).as("n_pair"))
    val cnt = ent.groupBy("entity_id").agg(count(lit(1)).cast("double").as("cnt"))
    pairs
      .join(cnt.select(col("entity_id").as("e1"), col("cnt").as("c1")), "e1")
      .join(cnt.select(col("entity_id").as("e2"), col("cnt").as("c2")), "e2")
      .select(col("e1"), col("e2"), col("n_pair"),
        round(log(col("n_pair") * lit(nDocs.toDouble) / (col("c1") * col("c2"))), 4)
          .as("pmi"))
  }
}
