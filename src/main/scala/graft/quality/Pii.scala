package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PII scrubbing — the RefinedWeb/FineWeb hygiene step: count and redact
  * email addresses, IPv4 literals, and NANP-style phone numbers before a
  * corpus ships. Pure codegen'd regexp expressions — narrow, no shuffle,
  * no UDF. The patterns deliberately use only syntax with IDENTICAL
  * semantics in Java regex and RE2 (character classes, bounded repeats,
  * `\b`, `\d`) so an external SQL oracle replays them byte-for-byte from
  * these same constants.
  */
object Pii {

  /** Conservative RFC-5322-ish mailbox. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 literal (no octet range check — scrubbing favors
    * recall over precision). */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** NANP `xxx-xxx-xxxx`. */
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** `(doc_id, n_emails, n_ips, n_phones, redacted)` — counts measured on
    * the input text; redaction applied email → IP → phone, so a replaced
    * placeholder can never be re-matched by a later pattern. */
  def scrub(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").cast("long").as("doc_id"),
      // idx 0 = the whole match: the patterns carry no capture groups, and
      // Spark's 2-arg regexp_extract_all defaults to group 1
      size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(col("text"), lit(Ipv4Re), lit(0))).as("n_ips"),
      size(regexp_extract_all(col("text"), lit(PhoneRe), lit(0))).as("n_phones"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), lit(EmailRe), lit("<EMAIL>")),
          lit(Ipv4Re), lit("<IP>")),
        lit(PhoneRe), lit("<PHONE>")).as("redacted"))
}
