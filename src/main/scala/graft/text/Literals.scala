package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measurement-literal normalization — the literal-canonicalization step
  * of KG construction: free text asserts quantities in mixed formats and
  * units ("12 kg", "3,500 m", "250ms"), and a KG that stores them as
  * strings can neither compare nor aggregate them. This extracts every
  * `<number> <unit>` mention and normalizes it onto a fixed SI-base
  * micro-integer scale, so downstream joins and range predicates run on
  * exact BIGINTs — no float drifts into a key (the same discipline as
  * q109's scaled-integer votes).
  *
  * Recognized: integers, decimals, and comma-grouped integers
  * (`\d{1,3}(,\d{3})+`), optionally space-separated from a unit in
  * {km, m, kg, g, ms, s}; comma-grouped decimals stay unrecognized (rare
  * in web text, and ambiguous against European decimal commas — the
  * judgment call surfaced here rather than guessed). "Unrecognized"
  * must mean NO mention, not a truncated one: without a left guard,
  * `"3,500.25 m"` fails the comma-grouped alternative at the dot, then
  * re-matches mid-number as `"500.25 m"` — a corrupted literal written
  * into the KG as an exact fact. Neither regex engine has lookbehind
  * (RE2 rejects it), so the guard is a consumed one-char non-capturing
  * prefix `(?:^|[^\d,.])`: a match can start only at the text start or
  * after a char that cannot be the tail of a number — a digit, comma,
  * or dot to the left kills the match instead of shifting it. (A side
  * effect surfaced deliberately: bare-dot decimals like `".5 m"` stay
  * out too.) Alternation order puts two-letter units first so
  * `km`/`kg`/`ms` win over their one-letter suffixes under the
  * leftmost-first preference BOTH regex engines share (Java's
  * backtracker and DuckDB's RE2 agree on this pattern family, which is
  * what lets the oracle replay extraction verbatim).
  *
  * Scale shape: extraction is one codegen'd `regexp_extract_all` pair
  * plus a posexplode — narrow, no shuffle, no UDF; normalization is a
  * constant CASE ladder. Output size is mention-bounded (matches per
  * doc), the same explode exposure as sentence segmentation.
  */
object Literals {

  /** `(unit, SI base, micros of base per unit)` — e.g. 1 km = 10⁹ µm. */
  val UnitMicros: Seq[(String, String, Long)] = Seq(
    ("km", "m", 1000000000L),
    ("m", "m", 1000000L),
    ("kg", "g", 1000000000L),
    ("g", "g", 1000000L),
    ("ms", "s", 1000L),
    ("s", "s", 1000000L))

  /** Two-letter units before their one-letter suffixes; the consumed
    * left-context guard keeps a failed comma-grouped-decimal from
    * re-matching mid-number (see class doc). */
  val Pattern: String =
    "(?:^|[^\\d,.])(\\d{1,3}(?:,\\d{3})+|\\d+(?:\\.\\d+)?)\\s?(km|kg|ms|m|g|s)\\b"

  /** Extract and normalize every measurement mention in `textCol`:
    * `(<idCol>, m_idx, raw_value, unit, si_unit, value_si_micro)` with
    * `m_idx` the 0-based mention position within the document and
    * `value_si_micro = round(value × micros-per-unit)` as BIGINT.
    * Half-up rounding matches DuckDB's `round` on the same doubles, and
    * the double product is exact for values below 2⁵³ micros — beyond
    * that a corpus needs decimal parsing, not this fast path. */
  def measurements(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val factor = UnitMicros.foldLeft(lit(null).cast("long")) {
      case (acc, (u, _, f)) => when(col("unit") === u, lit(f)).otherwise(acc)
    }
    val si = UnitMicros.foldLeft(lit(null).cast("string")) {
      case (acc, (u, b, _)) => when(col("unit") === u, lit(b)).otherwise(acc)
    }
    df.select(col(idCol),
        regexp_extract_all(col(textCol), lit(Pattern), lit(1)).as("nums"),
        regexp_extract_all(col(textCol), lit(Pattern), lit(2)).as("units"))
      .select(col(idCol),
        posexplode(arrays_zip(col("nums"), col("units"))).as(Seq("m_idx", "m")))
      .select(col(idCol), col("m_idx").cast("long").as("m_idx"),
        col("m.nums").as("raw_value"), col("m.units").as("unit"))
      .withColumn("value",
        regexp_replace(col("raw_value"), ",", "").cast("double"))
      .select(col(idCol), col("m_idx"), col("raw_value"), col("unit"),
        si.as("si_unit"),
        round(col("value") * factor).cast("long").as("value_si_micro"))
  }
}
