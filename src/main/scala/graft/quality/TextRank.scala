package graft.quality

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TextRank keyword scoring (Mihalcea & Tarau '04): PageRank over the
  * corpus word co-occurrence graph — vertices are token types, an
  * undirected edge links tokens that appear ADJACENT in some document,
  * and the stationary score ranks each token's centrality in how the
  * corpus actually composes text. The graph-based twin of TF-IDF
  * (q54): frequency-free, so it surfaces connective hub terms that
  * raw counts overrate or underrate, and it is the standard unsupervised
  * keyword extractor a corpus profile ships next to the Zipf head
  * ([[Zipf]]).
  *
  * Scale shape: adjacency pairs are built NARROW — `arrays_zip` of two
  * shifted `slice`s of the per-doc token array (the [[LmScore]] bigram
  * layout: no self-join, no per-token window) — then collapse to
  * DISTINCT unordered edges in one two-phase aggregate keyed by the
  * canonical (least, greatest) pair. Edge count is bounded by distinct
  * adjacent TYPE pairs (vocabulary-shaped, not corpus-shaped), so the
  * iterations run on a graph orders of magnitude smaller than the
  * token stream. Undirectedness is the two-way union of the distinct
  * edge set; the fixed-iteration loop itself is [[graft.kg.PageRank]] —
  * one dst-keyed shuffle per round, lineage checkpointed — and the
  * oracle unrolls the identical arithmetic through the shared
  * `PageRank.oracleSql` generator.
  */
object TextRank {

  /** `(node, rank)` — PageRank (damping 0.85, `iterations` fixed
    * rounds, rank rounded to 6) of every token in the adjacency
    * graph. Tokens that only ever neighbor themselves (or appear in
    * single-token documents) have no edge and are absent, exactly as
    * in the SQL replay. */
  def run(spark: SparkSession, docs: DataFrame, iterations: Int = 10): DataFrame =
    graft.kg.PageRank.run(spark, edges(docs), iterations)

  /** The symmetrized distinct-adjacency edge list `(src, dst)`. */
  def edges(docs: DataFrame): DataFrame = {
    val toks = docs.select(
      filter(split(trim(col("text")), "\\s+"), t => t =!= lit("")).as("toks"))
    val und = toks.filter(size(col("toks")) >= 2)
      .select(explode(arrays_zip(
        slice(col("toks"), lit(1), size(col("toks")) - 1).as("w1"),
        slice(col("toks"), lit(2), size(col("toks")) - 1).as("w2"))).as("b"))
      .filter(col("b.w1") =!= col("b.w2"))
      .select(least(col("b.w1"), col("b.w2")).as("u"),
        greatest(col("b.w1"), col("b.w2")).as("v"))
      .distinct()
    und.select(col("u").as("src"), col("v").as("dst"))
      .union(und.select(col("v").as("src"), col("u").as("dst")))
  }

  /** The edge construction as SQL (consumed by `PageRank.oracleSql`);
    * `bound` must cover the longest per-doc token list (the
    * `bigramSql` bound discipline — `oracleSqlFor` derives it from the
    * measured corpus max). */
  def edgesSql(bound: Long): String =
    s"""WITH tl AS (SELECT list_filter(string_split_regex(trim(text), '\\s+'),
       |     x -> x <> '') AS l FROM documents),
       | adj AS (SELECT l[g.i] AS w1, l[g.i + 1] AS w2
       |  FROM tl JOIN generate_series(1, $bound) g(i) ON g.i <= len(l) - 1),
       | und AS (SELECT DISTINCT least(w1, w2) AS u, greatest(w1, w2) AS v
       |  FROM adj WHERE w1 <> w2)
       | SELECT u AS src, v AS dst FROM und
       | UNION ALL SELECT v, u FROM und""".stripMargin.replaceAll("\n", " ")
}
