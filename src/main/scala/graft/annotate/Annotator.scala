package graft.annotate

/** Pluggable annotator boundary — the reference's only external call is the
  * chat completion at `ai/llm.py:38-76` (Ollama, temperature 0, errors
  * swallowed to ""). In the engine this trait is invoked inside
  * `mapPartitions`; production would bind an HTTP client per partition,
  * tests and benches bind the deterministic [[DictAnnotator]] (mirroring the
  * mocked completions of reference `tests/test_extractor_ner.py:34-37`).
  *
  * Implementations MUST be serializable (shipped to executors) and pure
  * functions of their inputs (determinism is a north-rule requirement).
  */
trait Annotator extends Serializable {
  def generate(systemPrompt: String, userPrompt: String): String
}

/** Deterministic mock: emits `<category>:<surface>` for every dictionary
  * entry whose surface occurs verbatim in the user prompt (the batch text),
  * in dictionary order; "None" when nothing matches (the reference prompt's
  * rule 6). Pure function of (dictionary, userPrompt). */
final case class DictAnnotator(dictionary: Seq[(String, String)]) extends Annotator {
  override def generate(systemPrompt: String, userPrompt: String): String = {
    val lines = dictionary.collect {
      case (cat, surf) if userPrompt.contains(surf) => s"<$cat>:$surf"
    }
    if (lines.isEmpty) "None" else lines.mkString("\n")
  }
}

/** Wraps another annotator's output in a `<think>…</think>` reasoning block —
  * produces what a reasoning model (reference `ai/llm.py:79-101`) would emit,
  * to exercise the LRM strip stage. */
final case class ThinkingAnnotator(inner: Annotator, reasoning: String = "step by step")
    extends Annotator {
  override def generate(systemPrompt: String, userPrompt: String): String =
    s"<think>\n$reasoning\n</think>\n" + inner.generate(systemPrompt, userPrompt)
}

object LrmStrip {
  /** Remove `<think>…</think>` (DOTALL, non-greedy) then Python-strip —
    * reference `ai/llm.py:100-101`. */
  def apply(response: String): String =
    graft.text.PyStr.strip("(?s)<think>.*?</think>".r.replaceAllIn(response, ""))
}
