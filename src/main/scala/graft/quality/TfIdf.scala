package graft.quality

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level TF-IDF: the classic distributed two-pass text statistic
  * (term frequency per document × inverse document frequency over the
  * corpus), used for keyword extraction, near-topic grouping, and as the
  * quality signal "is this page about anything". Complements the purely
  * per-row signals in [[TextQuality]] — IDF is the one text statistic
  * that REQUIRES a corpus-wide aggregation, so it exercises the
  * two-level-aggregate + broadcast-back shape.
  *
  * Plan shape at scale: tokenize (narrow) → per-(doc, term) counts (one
  * exchange, map-side combined) → document frequencies per term (second
  * aggregation over the FIRST aggregate — input is already (doc, term)
  * pairs, so df = count per term, no distinct needed) → join tf × df.
  * Whether the df table broadcasts is decided from its MEASURED row
  * count, not assumed: "vocabulary ≪ corpus" holds for curated text but
  * NOT for crawl text, where typos, hashes, and boilerplate push distinct
  * "terms" to 10⁸–10⁹ and an unconditional broadcast hint OOMs the
  * driver. At or under [[maxBroadcastTerms]] the hint deletes the tf-side
  * exchange; above it the hint is omitted and Catalyst/AQE plan the join
  * from their own size estimates (the same measured-count gate as
  * [[graft.kg.Triangles.count]] — the df aggregate is persisted first, so
  * the deciding count materializes the cache the join needs anyway). The
  * per-doc top-k is a rank-1..k window partitioned by doc, which Spark
  * runs with partial `WindowGroupLimit` below the exchange.
  * N (corpus size) is a literal computed once — not a per-row subquery.
  */
object TfIdf {

  /** Top-k terms per document by tf·idf with idf = ln(N / df).
    * Deterministic tie-break: score desc, then term asc.
    * Output: (doc_id, term, tfidf) rounded to 4 decimals.
    *
    * `maxBroadcastTerms`: largest measured vocabulary the df table may
    * have and still carry an explicit broadcast hint (5M terms ≈ low
    * hundreds of MB hashed — comfortable executor headroom; crawl-scale
    * vocabularies above it take the shuffled/AQE-planned join). */
  def topTerms(spark: SparkSession, docs: DataFrame, k: Int,
      maxBroadcastTerms: Long = 5000000L): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(split(trim(col("text")), "\\s+")).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // df from the tf aggregate: one row per (doc, term) already
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nTerms = df.count() // materializes the cache; decides the plan
    val dfSide = if (nTerms <= maxBroadcastTerms) broadcast(df) else df
    val n = docs.count()
    val score = col("tf") * log(lit(n.toDouble) / col("df"))
    val w = Window.partitionBy("doc_id").orderBy(score.desc, col("term").asc)
    tf.join(dfSide, "term")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("doc_id"), col("term"), round(score, 4).as("tfidf"))
  }
}
