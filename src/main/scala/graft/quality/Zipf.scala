package graft.quality

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Zipf rank–frequency fit over the corpus unigram distribution: the
  * head tokens ranked by frequency plus the fitted log-log slope
  * `ln(freq) ~ ln(rank)` (Zipf's law predicts ≈ −1). Corpus curators
  * read the slope as a health signal next to the Heaps β
  * ([[VocabGrowth]]): a slope collapsing toward 0 means boilerplate is
  * flattening the distribution (one template dominating every rank);
  * a slope far below −1 flags a vocabulary captured by a few tokens
  * (tag soup, truncated extraction). The standard fit uses the HEAD
  * ranks only — the tail of hapax legomena is a rank-tie staircase
  * that least squares should not see — so `k` bounds the fit window
  * explicitly.
  *
  * Scale shape: one token-keyed two-phase aggregate (map-side combine)
  * builds the frequency table; the head is `orderBy(...).limit(k)` —
  * Spark plans TakeOrderedAndProject, per-partition top-k + one
  * k-sized merge, never a full sort. The rank window orders ≤ k rows
  * (a single bounded task, not a corpus-wide window), and the slope is
  * the codegen'd `regr_slope` aggregate over those k rows joined back
  * as a literal. Ties rank by (freq desc, token asc) — the codepoint
  * order both engines share — so the head set and every rank are
  * byte-reproducible.
  */
object Zipf {

  /** `(rank, tok, freq, zipf_slope)` for the top-`k` tokens by corpus
    * frequency; `zipf_slope` is the same fitted scalar on every row,
    * rounded to 6 decimals (NULL when the head has < 2 distinct
    * ln(rank) points — the degenerate single-token corpus). */
  def rankFrequency(spark: SparkSession, docs: DataFrame, k: Int = 100): DataFrame = {
    val freq = docs.select(
        explode(split(trim(col("text")), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("freq"))
    val head = freq.orderBy(col("freq").desc, col("tok")).limit(k)
    val ranked = head.withColumn("rank",
        row_number().over(Window.orderBy(col("freq").desc, col("tok")))
          .cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // regr_slope is NULL on degenerate input — surface it as a NULL
    // column, exactly as the SQL replay does (the VocabGrowth hardening)
    val slopeRow = ranked
      .agg(round(expr("regr_slope(ln(freq), ln(rank))"), 6)).head()
    val slope: Any = if (slopeRow.isNullAt(0)) null else slopeRow.getDouble(0)
    ranked.select(col("rank"), col("tok"), col("freq"),
      lit(slope).cast("double").as("zipf_slope"))
  }

  /** The identical head + fit as SQL (rank/limit over the same
    * (freq desc, tok) order; `regr_slope` exists in both engines). */
  def oracleSql(k: Int = 100): String =
    s"""WITH toks AS (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok
       |   FROM documents),
       | f AS (SELECT tok, count(*) AS freq FROM toks WHERE tok <> '' GROUP BY tok),
       | hd AS (SELECT tok, freq,
       |   row_number() OVER (ORDER BY freq DESC, tok) AS rank
       |  FROM f ORDER BY freq DESC, tok LIMIT $k),
       | s AS (SELECT round(regr_slope(ln(freq), ln(rank)), 6) AS zipf_slope
       |       FROM hd)
       | SELECT hd.rank, hd.tok, hd.freq, s.zipf_slope
       | FROM hd CROSS JOIN s""".stripMargin.replaceAll("\n", " ")
}
