package graft.annotate

import graft.core.{Category, Mention}
import graft.text.PyStr

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/** The per-document mention-extraction dataflow — an exact-semantics port of
  * `ExtractorNER.extract_entities` (reference `ai/extractor_ner.py:37-124`):
  *
  *  1. segment text on `'\n'`, keeping each segment's start offset
  *     (`:57-67`);
  *  2. batch `sentencesPerCall` segments per annotator call, joined by
  *     `'\n'` (`:72-85`);
  *  3. parse each completion line `"<category>:<entity>"` — require `':'`,
  *     split once, `strip("<>")` the category, whitespace-strip the entity,
  *     drop empties — and de-duplicate `(category, entity)` pairs across all
  *     batches of the document (`:88-100`);
  *  4. ground every unique pair in the ORIGINAL full text with the
  *     find-resume scan [[PyStr.findAll]] (`:102-112`);
  *  5. keep mentions whose category is whitelisted and whose surface is
  *     non-blank, then sort by span start (`:115-121`).
  *
  * One deliberate divergence: the reference iterates a Python `set` at step 4
  * (nondeterministic order); we iterate pairs in sorted order so reruns and
  * resumes are byte-stable (north-rule determinism). After the final
  * sort-by-begin the outputs agree except among exact begin-ties, where the
  * reference itself is nondeterministic.
  */
object MentionExtractor {

  /** Segments with their start char offsets (reference `:57-67`). */
  def segment(text: String, sentencesPerCall: Int): Seq[(String, Int)] = {
    if (sentencesPerCall > 0) {
      val out = ArrayBuffer.empty[(String, Int)]
      var currentPos = 0
      var i = 0
      while (i < text.length) {
        if (text.charAt(i) == '\n') {
          out += ((PyStr.strip(text.substring(currentPos, i + 1)), currentPos))
          currentPos = i + 1
        }
        i += 1
      }
      if (currentPos < text.length)
        out += ((PyStr.strip(text.substring(currentPos)), currentPos))
      out.toSeq
    } else Seq((PyStr.strip(text), 0))
  }

  /** Parse one completion into `(category, entity)` pairs (reference `:88-100`;
    * dedup happens across batches in [[extract]]). */
  def parseCompletion(raw: String): Seq[(String, String)] = {
    PyStr.strip(raw).split("\n", -1).toSeq.flatMap { line =>
      if (line.isEmpty || !line.contains(":")) None
      else {
        val idx = line.indexOf(':')
        val category = PyStr.stripChars(line.substring(0, idx), "<>")
        val entity = PyStr.strip(line.substring(idx + 1))
        if (entity.isEmpty || category.isEmpty) None else Some((category, entity))
      }
    }
  }

  /** Full extraction for one document. */
  def extract(
      annotator: Annotator,
      systemPrompt: String,
      categories: Seq[Category],
      text: String,
      sentencesPerCall: Int = 0,
      stripThinking: Boolean = false): Seq[Mention] =
    extractWithStats(annotator, systemPrompt, categories, text,
      sentencesPerCall, stripThinking)._1

  /** As [[extract]], also returning the number of annotator batches that
    * FAILED (timeout / transport / non-200 after retries). The reference
    * silently maps a failed call to zero predictions (`ai/llm.py:75-76`);
    * the engine keeps that result semantics but surfaces the loss as
    * lineage (`failed_batches` in the pipeline metrics table, SURVEY §4). */
  def extractWithStats(
      annotator: Annotator,
      systemPrompt: String,
      categories: Seq[Category],
      text: String,
      sentencesPerCall: Int = 0,
      stripThinking: Boolean = false): (Seq[Mention], Int) = {

    val sentences = segment(text, sentencesPerCall)

    // collect unique (category, entity) pairs across all batches (`:70-100`)
    val pairs = mutable.LinkedHashSet.empty[(String, String)]
    var failedBatches = 0
    val step = math.max(1, sentencesPerCall)
    var i = 0
    while (i < sentences.length) {
      val batch = if (sentencesPerCall > 0) sentences.slice(i, i + sentencesPerCall) else sentences
      val batchText = batch.map(_._1).mkString("\n")
      val (raw0, failed) = annotator.generateChecked(systemPrompt, batchText)
      if (failed) failedBatches += 1
      val raw = if (stripThinking) LrmStrip(raw0) else raw0
      parseCompletion(raw).foreach(pairs += _)
      i += step
    }

    // ground each unique pair in the original text (`:102-112`), iterating
    // pairs in sorted order for determinism (see scaladoc above)
    val grounded = ArrayBuffer.empty[Mention]
    pairs.toSeq.sorted.foreach { case (category, entity) =>
      PyStr.findAll(text, entity).foreach { case (b, e) =>
        grounded += Mention(category, entity, b, e)
      }
    }

    // whitelist + non-blank filter, then stable sort by begin (`:115-121`)
    val names = categories.map(_.name).toSet
    val mentions = grounded.toSeq
      .filter(m => names.contains(m.category) && PyStr.strip(m.surface).nonEmpty)
      .sortBy(_.begin)
    (mentions, failedBatches)
  }
}
