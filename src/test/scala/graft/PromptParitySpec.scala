package graft

import graft.annotate.Prompts
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** BYTE parity of the prompt templates against the reference source itself
  * (`/root/reference/ai/prompts.py`) — not a transcription check but a
  * direct comparison with the shipped file. Skipped when the reference
  * snapshot isn't present (e.g. packaged library use). */
class PromptParitySpec extends AnyFunSuite {

  private val RefPath = "/root/reference/ai/prompts.py"

  /** Extract the three triple-quoted template values from prompts.py in
    * declaration order (en, es, it). */
  private def referenceTemplates(): Option[Seq[String]] = {
    val p = Paths.get(RefPath)
    if (!Files.exists(p)) None
    else {
      val src = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      val re = "(?s)\"\"\"(.*?)\"\"\"".r
      val all = re.findAllMatchIn(src).map(_.group(1)).toSeq
      // first match is the module docstring; the next three are the templates
      Some(all.drop(1).take(3))
    }
  }

  test("en/es/it templates are byte-identical to the reference file") {
    referenceTemplates() match {
      case None => cancel(s"$RefPath not present — parity check skipped")
      case Some(Seq(en, es, it)) =>
        assert(Prompts.En == en, "en template differs from reference")
        assert(Prompts.Es == es, "es template differs from reference")
        assert(Prompts.It == it, "it template differs from reference")
      case Some(other) =>
        fail(s"expected 3 templates in prompts.py, found ${other.length}")
    }
  }
}
