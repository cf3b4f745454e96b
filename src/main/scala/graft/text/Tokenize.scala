package graft.text

import graft.core.Mention

import scala.collection.mutable.ArrayBuffer

/** Char-span → token alignment and BIO tagging, ported with exact semantics
  * from the reference (`dataset.py:28-115`). These drive every downstream
  * metric, so the quirks are preserved deliberately:
  *
  *  - tokens come from Python `str.split()` (runs of whitespace, empties
  *    dropped) — [[PyStr.split]];
  *  - token char ranges use an **inclusive** end when testing overlap
  *    (`token_start <= char <= token_end`, reference `dataset.py:89-103`);
  *  - out-of-bounds span → no token indexes (`dataset.py:66-68`);
  *  - later entities overwrite earlier tags (`dataset.py:40-48`).
  */
object Tokenize {

  /** (startChar, endChar) per token; endChar is exclusive here (start+len),
    * overlap tests below apply the reference's inclusive comparison.
    * Port of the scan loop at reference `dataset.py:71-81`. */
  def tokenSpans(text: String): Array[(Int, Int)] = {
    val tokens = PyStr.split(text)
    val out = new ArrayBuffer[(Int, Int)](tokens.length)
    var pos = 0
    var i = 0
    while (i < tokens.length) {
      while (pos < text.length && PyStr.isSpace(text.charAt(pos))) pos += 1
      out += ((pos, pos + tokens(i).length))
      pos += tokens(i).length
      i += 1
    }
    out.toArray
  }

  /** First/last token index overlapping the char span, or None — exact port
    * of `Instance._get_token_indexes_from_span` (reference `dataset.py:51-115`),
    * including the inclusive-end overlap rule, the "first token starting
    * after start_char" fallback, and the clamp-to-bounds edge handling. */
  def spanToTokenIndexes(text: String, startChar: Int, endChar: Int): Option[(Int, Int)] = {
    if (startChar >= text.length || endChar > text.length) return None
    val spans = tokenSpans(text)

    var startIdx = -1
    var i = 0
    while (i < spans.length && startIdx < 0) {
      val (ts, te) = spans(i)
      if (ts <= startChar && startChar <= te) startIdx = i
      else if (startChar < ts) startIdx = i
      i += 1
    }

    var endIdx = -1
    var broke = false
    i = 0
    while (i < spans.length && !broke) {
      val (ts, te) = spans(i)
      if (ts <= endChar && endChar <= te) endIdx = i
      else if (ts > endChar) { endIdx = i - 1; broke = true }
      i += 1
    }

    if (startIdx < 0 && spans.nonEmpty) startIdx = 0
    if (endIdx < 0 && !broke && spans.nonEmpty) endIdx = spans.length - 1

    if (startIdx < 0 || endIdx < 0 || startIdx > endIdx) None
    else Some((startIdx, endIdx))
  }

  /** BIO tags parallel to `PyStr.split(text)` — exact port of
    * `Instance.get_bio_annotations` (reference `dataset.py:28-49`):
    * `B-<cat>` on the first overlapping token, `I-<cat>` on the rest;
    * entities applied in order, later ones overwrite. */
  def bioTags(text: String, mentions: Seq[Mention]): Array[String] = {
    val tags = Array.fill(PyStr.split(text).length)("O")
    mentions.foreach { m =>
      spanToTokenIndexes(text, m.begin, m.end).foreach { case (s, e) =>
        tags(s) = s"B-${m.category}"
        var i = s + 1
        while (i <= e) { tags(i) = s"I-${m.category}"; i += 1 }
      }
    }
    tags
  }
}
