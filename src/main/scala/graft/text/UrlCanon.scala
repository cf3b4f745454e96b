package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + canonical-URL dedup — the crawl-hygiene step
  * that runs BEFORE content dedup: a raw web crawl fetches the same page
  * under scheme/host-case variants, `www.` prefixes, default ports,
  * fragments, tracking query parameters, and trailing slashes. Collapsing
  * those to one canonical form is a pure narrow map (codegen'd string
  * expressions, no UDF), so it costs one scan; the dedup that follows is a
  * single map-side-combined aggregation on the canonical key.
  *
  * The rule set (each step a standard member of the RFC 3986 §6
  * normalization ladder plus the tracking-param strip every crawler adds):
  *   1. lowercase the scheme and the host,
  *   2. strip a `#fragment`,
  *   3. strip `utm_*` tracking query parameters (and a then-empty `?`),
  *   4. strip the scheme's default port (`:443` https, `:80` http),
  *   5. strip a leading `www.` host label,
  *   6. strip trailing `/` from the path.
  *
  * Every regexp avoids capture-group replacements, so the identical
  * pattern strings run on Java regex and RE2-style engines alike — the
  * property that lets an external SQL oracle replay the whole ladder.
  * The tracking-param strip is NOT a regexp: it splits the query on `&`
  * and drops params by `utm_` PREFIX (a higher-order filter — DuckDB's
  * `list_filter` + `starts_with` replays it), because a regexp over the
  * joined string either misses consecutive utm params or mangles params
  * that merely CONTAIN the substring `utm_`.
  */
object UrlCanon {

  /** Canonical form of `url` (column-to-column, narrow). */
  def canonicalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host0 = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    // default port, then www. — order matters for `www.x.org:443`
    val host1 = when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .otherwise(host0)
    val host = regexp_replace(host1, "^www\\.", "")
    val rest0 = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(.*)", 1)
    // drop utm_* params by PREFIX over the split param list (a Catalyst
    // higher-order filter, not regex surgery on the joined string) — so
    // 'utm_' INSIDE another param's name or value is never touched, and
    // any run of consecutive utm params collapses in one pass
    val qAt = instr(rest0, "?")
    val path = when(qAt > 0, rest0.substr(lit(1), qAt - 1)).otherwise(rest0)
    val rawq = rest0.substr(qAt + 1, length(rest0))
    val kept = array_join(
      filter(split(rawq, "&"), p => not(p.startsWith("utm_"))), "&")
    val rest = rtrim(
      when(qAt > 0 && kept =!= "", concat(path, lit("?"), kept))
        .otherwise(path), "/")
    concat(scheme, lit("://"), host, rest)
  }

  /** Group by canonical URL: `(canon_url, n_docs, min_doc_id)` — the
    * crawl-frontier dedup ledger (one fetch per canonical target). */
  def dedupByCanonical(pages: DataFrame, urlCol: String = "url",
      idCol: String = "doc_id"): DataFrame =
    pages
      .select(canonicalize(col(urlCol)).as("canon_url"), col(idCol))
      .groupBy("canon_url")
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("min_doc_id"))
}
