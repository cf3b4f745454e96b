package graft.quality

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vocabulary-growth (Heaps'-law) curve of a corpus: after each document
  * in doc_id order, the cumulative token count `N` and cumulative distinct
  * vocabulary `V(N)`, plus the fitted Heaps exponent β from the log-log
  * regression `ln V = ln K + β·ln N`. Corpus curators read this curve
  * constantly — a β collapsing toward 0 means the crawl has stopped
  * contributing new language (dedup threshold reached); a β near 1 flags
  * id-like token noise inflating the vocabulary.
  *
  * Scale shape: "cumulative distinct" is NOT a distinct-per-prefix scan
  * (quadratic) — each token type charges exactly its FIRST document
  * (min(doc_id) per token, one token-keyed aggregate), so per-doc new-type
  * counts sum to the cumulative vocabulary. The two running sums use the
  * distributed prefix-sum layout ([[graft.core.SequencePack]]'s pattern):
  * bucket by contiguous doc_id ranges, one total per bucket, driver
  * prefix-scan of the ~nBuckets totals, broadcast back, per-bucket window
  * — never a single-task global `Window.orderBy`. The β fit is Spark's
  * codegen'd `regr_slope` aggregate over the curve rows (one scalar), and
  * the scalar joins back by a literal, not a window.
  */
object VocabGrowth {

  /** `(doc_id, cum_tokens, cum_types, heaps_beta)` per document (docs with
    * zero tokens keep their position and add nothing); `heaps_beta` is the
    * same fitted scalar on every row, rounded to 4 decimals. */
  def heapsCurve(spark: SparkSession, docs: DataFrame,
      nBuckets: Int = 256): DataFrame = {
    import spark.implicits._
    val toks = docs.select(col("doc_id").cast("long").as("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
    val perDocTokens = toks.groupBy("doc_id").agg(count(lit(1)).as("n_tok"))
    // each token type charges its first document; min() needs no distinct
    // pre-pass — the aggregate dedups as it combines
    val newTypes = toks.groupBy("tok").agg(min("doc_id").as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_new"))
    val perDoc = docs.select(col("doc_id").cast("long").as("doc_id"))
      .join(perDocTokens, Seq("doc_id"), "left")
      .join(newTypes, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tok"), lit(0L)).as("n_tok"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))

    // distributed prefix sum over BOTH measures in one pass (SequencePack's
    // layout): contiguous doc_id ranges ⇒ (bucket asc, doc_id asc) is the
    // global order; the bucket-total collect is bounded at nBuckets rows
    val maxId = perDoc.agg(coalesce(max("doc_id"), lit(0L))).head().getLong(0)
    val span = maxId / nBuckets + 1
    val bucketed = perDoc.withColumn("b", (col("doc_id") / span).cast("int"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = bucketed.groupBy("b")
      .agg(sum("n_tok").as("t"), sum("n_new").as("v"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    var (accT, accV) = (0L, 0L)
    val offsets = totals.keys.toSeq.sorted.map { b =>
      val row = (b, accT, accV)
      accT += totals(b)._1; accV += totals(b)._2
      row
    }.toDF("b", "off_tok", "off_typ")
    val w = Window.partitionBy("b").orderBy("doc_id")
    val curve = bucketed.join(broadcast(offsets), "b")
      .select(col("doc_id"),
        (col("off_tok") + sum("n_tok").over(w)).as("cum_tokens"),
        (col("off_typ") + sum("n_new").over(w)).as("cum_types"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // regr_slope is NULL on degenerate input (no token-bearing docs, or a
    // constant ln(cum_tokens) margin) — surface it as a NULL beta column,
    // exactly as the SQL replay does, never an NPE (the same empty-table
    // hardening as oracleSqlFor's bound derivation)
    val betaRow = curve.filter(col("cum_tokens") > 0)
      .agg(round(expr("regr_slope(ln(cum_types), ln(cum_tokens))"), 4))
      .head()
    val beta: Any = if (betaRow.isNullAt(0)) null else betaRow.getDouble(0)
    curve.withColumn("heaps_beta", lit(beta).cast("double"))
  }

  /** The identical curve + fit as SQL. The oracle's running sums may use a
    * plain global window — oracle scale, not engine scale. */
  def oracleSql: String =
    """WITH toks AS (SELECT doc_id,
      |   unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents),
      | nz AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
      | nt AS (SELECT d.doc_id, count(nz.tok) AS n_tok
      |   FROM documents d LEFT JOIN nz ON nz.doc_id = d.doc_id
      |   GROUP BY d.doc_id),
      | fo AS (SELECT tok, min(doc_id) AS doc_id FROM nz GROUP BY tok),
      | nv AS (SELECT doc_id, count(*) AS n_new FROM fo GROUP BY doc_id),
      | cur AS (SELECT nt.doc_id,
      |   (sum(nt.n_tok) OVER (ORDER BY nt.doc_id))::BIGINT AS cum_tokens,
      |   (sum(coalesce(nv.n_new, 0)) OVER (ORDER BY nt.doc_id))::BIGINT AS cum_types
      |  FROM nt LEFT JOIN nv ON nv.doc_id = nt.doc_id),
      | b AS (SELECT round(regr_slope(ln(cum_types), ln(cum_tokens)), 4) AS beta
      |       FROM cur WHERE cum_tokens > 0)
      | SELECT doc_id, cum_tokens, cum_types, b.beta AS heaps_beta
      | FROM cur CROSS JOIN b""".stripMargin.replaceAll("\n", " ")
}
