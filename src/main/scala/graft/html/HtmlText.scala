package graft.html

import scala.collection.mutable.ArrayBuffer

/** Deterministic HTML → text extraction (SURVEY.md §7 stage 1).
  *
  * The north rule requires byte-identical extracted text per url
  * (BASELINE.json input_hint). The reference consumes pre-extracted `.txt`
  * (its BRAT loader just reads + strips, `datasets_info/utils/brat.py:20-21`),
  * so the normative contract is defined here once and golden-tested:
  *
  *  - the page's content paragraphs are the `<p>…</p>` blocks, in document
  *    order;
  *  - entity-decode the five XML escapes (`&amp; &lt; &gt; &quot; &#39;`);
  *  - join paragraphs with `"\n"`.
  *
  * [[HtmlGen.render]] is the exact inverse used by the fixture generator, so
  * `extract(render(text)) == text` for every text — the per-row invariant
  * the pipeline re-verifies at run time.
  */
object HtmlText {

  private val P = "(?s)<p>(.*?)</p>".r

  def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;").replace("'", "&#39;")

  def unescape(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&amp;", "&")

  /** Extract content text from an HTML page (UTF-8 bytes). */
  def extract(html: Array[Byte]): String = {
    val doc = new String(html, java.nio.charset.StandardCharsets.UTF_8)
    val paras = ArrayBuffer.empty[String]
    P.findAllMatchIn(doc).foreach(m => paras += unescape(m.group(1)))
    paras.mkString("\n")
  }
}

/** Fixture-side renderer: wraps each `"\n"`-separated paragraph of `text`
  * in `<p>` with boilerplate around — Common-Crawl-ish shape, deterministic. */
object HtmlGen {
  def render(url: String, title: String, text: String): Array[Byte] = {
    val paras = text.split("\n", -1)
      .map(p => s"<p>${HtmlText.escape(p)}</p>").mkString("\n")
    val doc =
      s"""<!DOCTYPE html>
         |<html><head><meta charset="utf-8"><title>${HtmlText.escape(title)}</title></head>
         |<body>
         |<nav><a href="/">home</a> | <a href="/about">about</a></nav>
         |<div class="content">
         |$paras
         |</div>
         |<footer>&copy; example.org · <a href="$url">permalink</a></footer>
         |</body></html>
         |""".stripMargin
    doc.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }
}
