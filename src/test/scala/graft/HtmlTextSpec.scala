package graft

import graft.html.{HtmlGen, HtmlText}
import org.scalatest.funsuite.AnyFunSuite

/** The per-row invariant of the north rule: byte-identical extracted text
  * per url — `extract(render(text)) == text` for every text. */
class HtmlTextSpec extends AnyFunSuite {

  private def roundTrip(text: String): Unit =
    assert(HtmlText.extract(HtmlGen.render("https://x.example/1", "t", text)) == text)

  test("round-trips plain text") {
    roundTrip("the fast key order sort")
  }

  test("round-trips multi-paragraph text") {
    roundTrip("para one\npara two\npara three")
  }

  test("round-trips empty paragraphs and empty text") {
    roundTrip("a\n\nb")
    roundTrip("")
    roundTrip("\n")
  }

  test("round-trips markup-looking content") {
    roundTrip("literal <p>not a tag</p> & ampersand \"quotes\" 'apostrophe'")
    roundTrip("&amp; already-escaped stays literal")
    roundTrip("</div><script>alert(1)</script>")
  }

  test("round-trips unicode") {
    roundTrip("entità città ñandú 日本語\nsegunda línea")
  }

  test("seeded fuzz round-trip") {
    val rnd = new scala.util.Random(99)
    val alphabet = "ab<>&\"' \n"
    (1 to 500).foreach { _ =>
      val text = Seq.fill(rnd.nextInt(80))(alphabet(rnd.nextInt(alphabet.length))).mkString
      roundTrip(text)
    }
  }

  test("extractor ignores boilerplate outside <p> blocks") {
    val html = HtmlGen.render("https://x.example/2", "title", "only this")
    val s = new String(html, java.nio.charset.StandardCharsets.UTF_8)
    assert(s.contains("<nav>") && s.contains("<footer>"))
    assert(HtmlText.extract(html) == "only this")
  }
}
