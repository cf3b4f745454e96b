package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-Triples serialization — the line-oriented RDF interchange format KG
  * snapshots actually ship in (W3C N-Triples: one `<s> <p> "o" .` per
  * line, newline-free by construction, so the files are splittable on a
  * 1000-executor read just like JSONL).
  *
  * Subjects and predicates are IRIs under the `kg:` prefix and must stay
  * in the IRI-safe charset `[A-Za-z0-9_:.#/-]` (the pipeline mints both
  * vocabularies, so this is an assertable contract — [[serialize]] fails
  * fast on violations rather than emitting an unparseable line). Objects
  * are arbitrary literals escaped per the spec: `\\ \" \n \r \t`, with
  * backslash escaped FIRST so the mapping is injective.
  *
  * Everything is pure `functions._` string ops (codegen'd, no UDF); the
  * unescape routes `\\` through a U+0001 sentinel so `\\n` (escaped
  * backslash, then n) never collides with `\n` (escaped newline) — the
  * classic chained-replace bug. Raw object text containing U+0001 is
  * outside the contract and rejected by the same validity gate.
  */
object NTriples {

  private val IriSafe = "^[A-Za-z0-9_:.#/-]+$"
  private val Sentinel = "\u0001"

  private def escape(c: Column): Column = {
    val noSlash = regexp_replace(c, "\\\\", "\\\\\\\\")
    val noQuote = regexp_replace(noSlash, "\"", "\\\\\"")
    val noNl = regexp_replace(noQuote, "\n", "\\\\n")
    val noCr = regexp_replace(noNl, "\r", "\\\\r")
    regexp_replace(noCr, "\t", "\\\\t")
  }

  private def unescape(c: Column): Column = {
    val sent = regexp_replace(c, "\\\\\\\\", Sentinel)
    val nl = regexp_replace(sent, "\\\\n", "\n")
    val cr = regexp_replace(nl, "\\\\r", "\r")
    val tab = regexp_replace(cr, "\\\\t", "\t")
    val quote = regexp_replace(tab, "\\\\\"", "\"")
    regexp_replace(quote, Sentinel, "\\\\")
  }

  /** Column-level serializer: `(subj, pred, obj)` columns → the N-Triples
    * line. A subj/pred outside the IRI-safe charset or an obj containing
    * the sentinel fails the task (a distributed `raise_error`, not a
    * driver-side scan). Exposed at column granularity so a roundtrip
    * check can zip source, line, and re-parse in ONE projection. */
  def lineOf(subj: Column, pred: Column, obj: Column): Column =
    when(subj.rlike(IriSafe) && pred.rlike(IriSafe) &&
        !obj.contains(Sentinel),
      concat(lit("<kg:"), subj, lit("> <kg:"), pred,
        lit("> \""), escape(obj), lit("\" .")))
      .otherwise(raise_error(concat(lit("non-serializable triple: subj="),
        subj, lit(" pred="), pred)))

  private val LinePat = "^<kg:([^>]*)> <kg:([^>]*)> \"(.*)\" \\.$"

  /** Column-level parser: the line column → a `(subj, pred, obj)` struct.
    * A line that does not match the grammar parses to empty-string fields
    * (surfaced, not dropped, so a roundtrip check can count them — the
    * greedy obj match is safe because escaped quotes mean `" .` can only
    * close the line). */
  def parsed(line: Column): Column = struct(
    regexp_extract(line, LinePat, 1).as("subj"),
    regexp_extract(line, LinePat, 2).as("pred"),
    unescape(regexp_extract(line, LinePat, 3)).as("obj"))

  /** `(subj, pred, obj)` → one N-Triples `line` per row. */
  def serialize(triples: DataFrame): DataFrame =
    triples.select(
      lineOf(col("subj"), col("pred"), col("obj")).as("line"))

  /** N-Triples `line` rows → `(subj, pred, obj)`. */
  def parse(lines: DataFrame): DataFrame = {
    val p = parsed(col("line"))
    lines.select(p.getField("subj").as("subj"),
      p.getField("pred").as("pred"), p.getField("obj").as("obj"))
  }
}
