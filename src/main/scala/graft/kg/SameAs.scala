package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** owl:sameAs-style fact collapse through a document-identity map — the
  * step that makes near-dup detection change the KG, not just the corpus:
  * when two pages are mirrors ([[graft.dedup.Dedup.clusters]]' LSH →
  * connected-components composition), every fact grounded in a mirror is
  * the SAME fact grounded in the cluster winner's page, and a KG that
  * keeps both double-counts its evidence (the reference keeps one
  * annotation per document — `ai/extractor_ner.py:100`'s per-doc pair
  * dedup — so duplicated pages are exactly the case it never faces and a
  * web-scale crawl always does).
  *
  * Output: `(subj, pred, obj, n_sources)` — triples re-grounded on the
  * canonical page URI (`doc://<cluster winner>`), with `n_sources` =
  * distinct pre-collapse pages asserting the fact. The count is the
  * provenance signal fusion wants ("how many INDEPENDENT pages say
  * this") with mirror inflation removed: a fact on one page mirrored 40
  * times collapses to `n_sources = 1` only if all 40 land in one
  * cluster; partial mirrors keep their genuine multiplicity.
  *
  * Scale shape: the mention stream is touched by ONE equi-join against
  * the non-winner half of the cluster map (docs whose canonical target
  * differs from themselves — bounded by near-dup membership, typically a
  * few percent of the corpus and always ≤ it) followed by one
  * map-side-combined aggregate on the rewritten key. AQE broadcasts the
  * map when the near-dup rate is low (the common case) and falls back to
  * a shuffled join when a crawl is mirror-heavy — no manual gate needed
  * because correctness is identical either way. No window, no explode,
  * no per-cluster buffer: a pathological 10M-page mirror cluster costs
  * the aggregate one hot key (the q08/q52 salting exposure), never a
  * collected array.
  */
object SameAs {

  /** Collapse per-document facts through a cluster map.
    *
    * @param linked     disambiguated mentions carrying `doc_id`,
    *                   `entity_id`, `category` ([[Kg.disambiguate]] output)
    * @param clusters   `(doc_id, cluster_id, is_winner)` — every doc maps
    *                   to its canonical cluster representative
    *                   ([[graft.dedup.Dedup.clusters]]; singletons map to
    *                   themselves)
    * @param predicates category → predicate map ([[Kg.triples]]' contract)
    */
  def collapseFacts(linked: DataFrame, clusters: DataFrame,
      predicates: Map[String, String]): DataFrame = {
    // per-page facts BEFORE uri construction, so the rewrite is a plain
    // long-keyed join instead of a string surgery on doc:// uris
    val facts = linked
      .select(col("entity_id").as("subj"), Kg.predColumn(predicates).as("pred"),
        col("doc_id").cast("long").as("doc_id"))
      .filter(col("pred").isNotNull)
      .distinct()
    // only docs whose canonical target differs need a row — singleton
    // winners coalesce to themselves for free
    val remap = clusters
      .filter(col("cluster_id") =!= col("doc_id"))
      .select(col("doc_id"), col("cluster_id"))
    facts
      .join(remap, Seq("doc_id"), "left")
      .select(col("subj"), col("pred"),
        coalesce(col("cluster_id"), col("doc_id")).as("canon"),
        col("doc_id"))
      .groupBy(col("subj"), col("pred"), col("canon"))
      .agg(countDistinct(col("doc_id")).as("n_sources"))
      .select(col("subj"), col("pred"),
        concat(lit("doc://"), col("canon").cast("string")).as("obj"),
        col("n_sources"))
  }
}
