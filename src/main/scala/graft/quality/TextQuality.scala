package graft.quality

import graft.text.PyStr
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * language identification (character n-gram heuristic), quality scoring,
  * token counting, and document fingerprinting. All pure functions of the
  * text — deterministic across reruns and JVMs. */
object TextQuality {

  /** Tiny trigram profiles for the five fixture languages — the classic
    * n-gram language-ID heuristic (Cavnar & Trenkle '94 shape) with
    * hand-picked high-frequency trigrams; enough for a deterministic,
    * dependency-free classifier. */
  val Profiles: Map[String, Set[String]] = Map(
    "en" -> Set(" th", "the", "he ", " an", "and", "nd ", " of", "of ", "ing", "ng ", " to", "ion"),
    "es" -> Set(" de", "de ", " la", "la ", "os ", " el", "el ", "ión", "ció", " qu", "que", "as "),
    "it" -> Set(" di", "di ", " la", " il", "il ", "re ", " co", "to ", "ion", "one", "lla", "ell"),
    "de" -> Set(" de", "der", "er ", "ie ", " di", "die", "ch ", "ein", " ei", "und", " un", "sch"),
    "fr" -> Set(" de", "de ", " le", "le ", "es ", " la", "ent", "nt ", "ion", " et", "et ", "que"))

  def trigrams(text: String): Iterator[String] = {
    val t = " " + PyStr.split(text.toLowerCase).mkString(" ") + " "
    if (t.length < 3) Iterator.empty else t.sliding(3)
  }

  /** Predict language by trigram-profile overlap; deterministic tie-break on
    * language code; "und" (undetermined) when nothing matches. */
  def detectLang(text: String): String = {
    val counts = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    trigrams(text).foreach { g =>
      Profiles.foreach { case (lang, prof) => if (prof.contains(g)) counts(lang) += 1 }
    }
    if (counts.isEmpty) "und"
    else counts.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
  }

  def langId(spark: SparkSession, docs: DataFrame): DataFrame =
    docs.select(col("doc_id").cast("long"), langIdCol(col("text")).as("pred_lang"))

  /** [[detectLang]] as pure built-in expressions — whole-stage-codegen'd,
    * no typed-map serialization boundary in the scan (the shape that
    * matters when language-ID runs over every document of a crawl).
    * Semantics identical: normalized " tok tok " trigrams, per-language
    * OCCURRENCE counts (not distinct — `filter`, never `array_intersect`),
    * argmax with alphabetical tie-break, "und" on zero hits. */
  def langIdCol(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val norm = concat(lit(" "),
      array_join(split(trim(lower(text)), "\\s+"), " "), lit(" "))
    val tri = when(length(norm) >= 3,
      transform(sequence(lit(1), length(norm) - 2), i => norm.substr(i, lit(3))))
      .otherwise(array().cast("array<string>"))
    val best = Profiles.keys.toSeq.sorted.foldLeft((lit("und"), lit(0))) {
      case ((bestLang, bestCnt), lang) =>
        val prof = array(Profiles(lang).toSeq.sorted.map(lit): _*)
        val cnt = size(filter(tri, g => array_contains(prof, g)))
        (when(cnt > bestCnt, lit(lang)).otherwise(bestLang),
          when(cnt > bestCnt, cnt).otherwise(bestCnt))
    }
    best._1
  }

  /** Deterministic 64-bit rolling polynomial fingerprint (Rabin–Karp style)
    * of the whitespace-normalized, lowercased text. */
  def fingerprint(text: String): Long = {
    val norm = PyStr.split(text.toLowerCase).mkString(" ")
    var h = 1125899906842597L
    var i = 0
    while (i < norm.length) { h = 31 * h + norm.charAt(i); i += 1 }
    h
  }

  /** GPT-2-style pre-tokenizer pattern (contractions, space-prefixed
    * letter/digit/punctuation runs, whitespace), restricted to the subset
    * that Java regex (engine) and RE2 (DuckDB oracle) interpret
    * identically — no lookarounds. Counting these segments approximates
    * the BPE token count within the pre-tokenizer's granularity, the
    * standard cheap length signal for training-data budgeting. */
  val BpePattern: String =
    "'(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** Pre-tokenizer segment count as a codegen'd column (no UDF). */
  def bpeTokenCount(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  /** Quality-signal columns computed with built-in (codegen'd) expressions:
    * token count, punctuation ratio, stopword ratio, mean word length —
    * the standard web-corpus quality heuristics. */
  def qualitySignals(docs: DataFrame, stopwords: Seq[String]): DataFrame = {
    val toks = split(trim(col("text")), "\\s+")
    val stopArr = array(stopwords.map(lit): _*)
    docs.select(
      col("doc_id"),
      size(toks).as("n_tokens"),
      round(length(regexp_replace(col("text"), "[^.,;:!?]", "")).cast("double") /
        greatest(length(col("text")), lit(1)), 4).as("punct_ratio"),
      round(size(array_intersect(toks, stopArr)).cast("double") / size(toks), 4)
        .as("stopword_hit_ratio"),
      round(length(regexp_replace(col("text"), "\\s", "")).cast("double") / size(toks), 4)
        .as("avg_word_len"))
  }
}
