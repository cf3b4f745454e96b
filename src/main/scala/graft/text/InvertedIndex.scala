package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rare-token inverted index (posting-list construction) — the corpus
  * structure behind exact-phrase search, contamination lookup, and
  * targeted document retrieval over a training corpus.
  *
  * The scale trap in posting construction is the head of the Zipf curve:
  * `collect_list(doc_id)` for a stopword would materialize a posting the
  * size of the corpus inside one aggregation buffer. This operator is
  * therefore TWO aggregations, not one:
  *
  *   1. document frequency per token — a pure count, map-side combined,
  *      safe for any token no matter how hot;
  *   2. posting lists ONLY for tokens that passed the df filter — the
  *      collect_list runs exclusively on tokens whose posting is provably
  *      ≤ `maxDf` entries, so no aggregation buffer can exceed that bound.
  *
  * The df relation joins back into the token stream by token; a rare-token
  * set is vocabulary-sized, and AQE broadcast-plans it when it measures
  * small. Postings are emitted as a comma-joined string of ascending
  * doc_ids — scalar cells survive external oracle compares where
  * list-typed cells stringify per-engine.
  */
object InvertedIndex {

  /** Per-document distinct whitespace tokens: `(doc_id, tok)`. */
  private def docTokens(docs: DataFrame): DataFrame = docs
    .select(col("doc_id").cast("long").as("doc_id"),
      explode(array_distinct(split(trim(col("text")), "\\s+"))).as("tok"))

  /** Data-relative "rare" ceiling: the `nDistinct`-th smallest DISTINCT
    * document frequency (the max df if fewer exist; 0 on an empty
    * corpus). An absolute threshold can't be right across corpora whose
    * vocabularies differ by orders of magnitude; ranking the distinct df
    * values is scale-free, and the df relation it ranks is
    * vocabulary-sized — the sort is tiny. */
  def rareDfCeiling(docs: DataFrame, nDistinct: Int = 8): Long =
    ceilingOf(docTokens(docs).groupBy("tok").agg(count(lit(1)).as("df")),
      nDistinct)

  private def ceilingOf(df: DataFrame, nDistinct: Int): Long = {
    val head = df.select("df").distinct().orderBy("df").limit(nDistinct)
      .agg(max(col("df"))).first()
    if (head.isNullAt(0)) 0L else head.getLong(0)
  }

  /** One-pass composition of [[rareDfCeiling]] + [[rareTokenPostings]]:
    * the (vocabulary-sized) df aggregate is computed ONCE and persisted,
    * the ceiling ranks it, and the posting pass reuses it — two corpus
    * scans total instead of the three (and two identical wide
    * aggregations) the separate calls would cost. */
  def rarePostingsByRank(docs: DataFrame, nDistinct: Int = 8): DataFrame = {
    val toks = docTokens(docs)
    val df = toks.groupBy("tok").agg(count(lit(1)).as("df")).persist()
    val ceiling = ceilingOf(df, nDistinct)
    toks.join(df.filter(col("df") <= ceiling), "tok")
      .groupBy("tok", "df")
      .agg(array_join(transform(sort_array(collect_list(col("doc_id"))),
        x => x.cast("string")), ",").as("postings"))
  }

  /** `(tok, df, postings)` for whitespace tokens with document frequency
    * `≤ maxDf`; postings = ascending doc_ids, comma-joined. */
  def rareTokenPostings(docs: DataFrame, maxDf: Long): DataFrame = {
    val toks = docTokens(docs)
    val df = toks.groupBy("tok").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    toks.join(df, "tok")
      .groupBy("tok", "df")
      .agg(array_join(transform(sort_array(collect_list(col("doc_id"))),
        x => x.cast("string")), ",").as("postings"))
  }
}
