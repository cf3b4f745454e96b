package graft.core

import java.sql.Timestamp

/** Core data model for the graft KG-construction engine.
  *
  * Shapes mirror the reference semantics (see SURVEY.md §1):
  *  - `Category`  ~ reference `model/category.py:4-7`
  *  - `Mention`   ~ reference `model/entity.py:5-10` (char-offset span,
  *    half-open `[begin, end)`)
  *  - `WebPage`   = the north-rule input table shape (BASELINE.json
  *    input_hint): (url, warc_ts, html, text, lang)
  *  - `Triple`    = materialized KG output (subj, pred, obj) + lineage
  */
final case class Category(name: String, description: String)

/** A grounded entity mention within a document's text. */
final case class Mention(category: String, surface: String, begin: Int, end: Int)

/** Mention keyed by document (row of the mentions table). */
final case class DocMention(url: String, category: String, surface: String, begin: Int, end: Int)

/** One row of the web-page input table (Iceberg-style; Parquet stand-in). */
final case class WebPage(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Gold annotation row (reference BRAT/TSV gold shape, FIXTURES.md §2). */
final case class GoldMention(url: String, category: String, surface: String, begin: Int, end: Int)

/** Alias-dictionary row for candidate generation (FIXTURES.md §3). */
final case class Alias(alias: String, entity_id: String, score: Double)

/** A knowledge-graph triple with lineage back to the source page. */
final case class Triple(subj: String, pred: String, obj: String, url: String)

/** Token-level evaluation counters (fractional — partial matches score 0.5,
  * reference `pipeline.py:14-19,84-87`). */
final case class TokenMetrics(tp: Double, fp: Double, fn: Double) {
  def +(o: TokenMetrics): TokenMetrics = TokenMetrics(tp + o.tp, fp + o.fp, fn + o.fn)
}

/** precision/recall/F1 with zero-guarded denominators (reference `pipeline.py:102-123`). */
final case class F1Metrics(precision: Double, recall: Double, f1: Double)

object F1Metrics {
  def from(tp: Double, fp: Double, fn: Double): F1Metrics = {
    val p = if (tp + fp > 0) tp / (tp + fp) else 0.0
    val r = if (tp + fn > 0) tp / (tp + fn) else 0.0
    val f = if (p + r > 0) 2 * p * r / (p + r) else 0.0
    F1Metrics(p, r, f)
  }
}
