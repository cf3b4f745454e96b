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
  * The df table has vocabulary cardinality (≪ corpus), so the join back
  * broadcasts; the per-doc top-k is a rank-1..k window partitioned by
  * doc, which Spark runs with partial `WindowGroupLimit` below the
  * exchange. N (corpus size) is a literal computed once — not a
  * per-row subquery.
  */
object TfIdf {

  /** Top-k terms per document by tf·idf with idf = ln(N / df).
    * Deterministic tie-break: score desc, then term asc.
    * Output: (doc_id, term, tfidf) rounded to 4 decimals. */
  def topTerms(spark: SparkSession, docs: DataFrame, k: Int): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(split(trim(col("text")), "\\s+")).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // df from the tf aggregate: one row per (doc, term) already
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.count()
    val score = col("tf") * log(lit(n.toDouble) / col("df"))
    val w = Window.partitionBy("doc_id").orderBy(score.desc, col("term").asc)
    tf.join(broadcast(df), "term")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("doc_id"), col("term"), round(score, 4).as("tfidf"))
  }
}
