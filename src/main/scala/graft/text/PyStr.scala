package graft.text

import scala.collection.mutable.ArrayBuffer

/** Exact-parity ports of the CPython string operations the reference relies
  * on. Every metric downstream depends on these behaving byte-identically to
  * Python 3.12 (SURVEY.md §7 "hard parts" #1):
  *
  *  - `str.split()` (no args): split on runs of whitespace, drop empties
  *    (reference `dataset.py:37`)
  *  - `str.strip()` / `str.strip(chars)` (reference `ai/extractor_ner.py:62,95-96`)
  *  - `str.find(needle, pos)` resume-at-end scan (reference
  *    `ai/extractor_ner.py:104-112`)
  *  - `str.isspace()` character class (drives both split and strip)
  */
object PyStr {

  /** Python `str.isspace()` for a single char: Unicode whitespace property
    * plus bidirectional classes WS/B/S. Differs from Java's
    * `Character.isWhitespace` by *including* the non-breaking spaces
    * U+00A0, U+2007, U+202F and NEL U+0085.
    */
  def isSpace(c: Char): Boolean =
    Character.isWhitespace(c) || c == '\u00a0' || c == '\u0085' ||
      c == '\u2007' || c == '\u202f'

  /** Python `str.strip()` — strip isspace() chars from both ends. */
  def strip(s: String): String = {
    var i = 0
    var j = s.length
    while (i < j && isSpace(s.charAt(i))) i += 1
    while (j > i && isSpace(s.charAt(j - 1))) j -= 1
    s.substring(i, j)
  }

  /** Python `str.strip(chars)` — strip any char in `chars` from both ends
    * (a char *set*, not a prefix/suffix string). Used for `strip("<>")` at
    * reference `ai/extractor_ner.py:95`. */
  def stripChars(s: String, chars: String): String = {
    var i = 0
    var j = s.length
    while (i < j && chars.indexOf(s.charAt(i)) >= 0) i += 1
    while (j > i && chars.indexOf(s.charAt(j - 1)) >= 0) j -= 1
    s.substring(i, j)
  }

  /** Python `str.split()` with no arguments: tokens separated by runs of
    * isspace() chars; leading/trailing whitespace yields no empty tokens. */
  def split(s: String): Array[String] = {
    val out = ArrayBuffer.empty[String]
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isSpace(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isSpace(s.charAt(i))) i += 1
      if (i > start) out += s.substring(start, i)
    }
    out.toArray
  }

  /** All non-overlapping occurrences of `needle` in `text`, scanning
    * left-to-right and resuming at the *end* of each match — the exact
    * `while True: text.find(entity, pos)` loop of reference
    * `ai/extractor_ner.py:104-112`. Returns half-open `[begin, end)` spans.
    * `needle` must be non-empty (the reference filters empty entities
    * before grounding).
    */
  def findAll(text: String, needle: String): Array[(Int, Int)] = {
    require(needle.nonEmpty, "findAll needle must be non-empty")
    val out = ArrayBuffer.empty[(Int, Int)]
    var pos = 0
    var idx = text.indexOf(needle, pos)
    while (idx >= 0) {
      val end = idx + needle.length
      out += ((idx, end))
      pos = end
      idx = text.indexOf(needle, pos)
    }
    out.toArray
  }
}
