package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram language-model quality score — the shape of the CCNet/KenLM
  * perplexity filter, with the corpus itself as the model: each document
  * scores the mean natural-log probability of its tokens under corpus
  * unigram frequencies. Very low scores flag rare-token gibberish and
  * encoding damage; very high scores flag boilerplate-heavy text — both
  * tails are what a production filter trims.
  *
  * Scale shape: one token-keyed two-phase aggregate builds the model
  * (partial map-side combine), then the counts join back to the token
  * stream — broadcast ONLY when the MEASURED vocabulary fits (the q54
  * TF-IDF lesson: crawl vocabularies are not small), else a shuffled join
  * AQE sizes. The token stream is recomputed (narrow explode) rather than
  * persisted — at corpus scale the recompute is cheaper than caching every
  * token row (the same trade line-level dedup makes).
  */
object LmScore {

  /** `(doc_id, n_tokens, avg_logprob)` for every document with ≥1
    * whitespace token; `avg_logprob = avg(ln(count(tok)/N))` rounded to 4
    * decimals. */
  def unigramLogProb(docs: DataFrame, maxBroadcastVocab: Long = 5000000L): DataFrame = {
    val toks = docs.select(col("doc_id").cast("long").as("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val head = counts.agg(
      coalesce(sum("c"), lit(0L)).as("n"), count(lit(1)).as("v")).head()
    val (nTotal, vocab) = (head.getLong(0), head.getLong(1))
    val model = if (vocab <= maxBroadcastVocab) broadcast(counts) else counts
    toks.join(model, "tok")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(log(col("c").cast("double") / nTotal)), 4).as("avg_logprob"))
  }
}
