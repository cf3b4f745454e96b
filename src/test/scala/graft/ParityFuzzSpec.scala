package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.annotate.{Annotator, MentionExtractor, Prompts}
import graft.core.{Category, Mention}
import graft.text.Tokenize
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Differential parity against the REAL reference implementation: the
  * committed fixture `parity_cases.json` was produced by running
  * `/root/reference` code (extractor + token alignment + BIO) on 500 seeded
  * random inputs (`scripts/gen_parity_fixture.py`); this spec replays every
  * case through the engine and requires exact agreement. */
class ParityFuzzSpec extends AnyFunSuite {

  private case class FixedAnnotator(response: String) extends Annotator {
    override def generate(systemPrompt: String, userPrompt: String): String = response
  }

  private val Cats = Seq("TOOL", "OPERATION", "PLACE", "ORG")
    .map(c => Category(c, s"$c desc"))
  private val SysPrompt = Prompts.systemPrompt("en", Cats)

  private lazy val cases: Seq[JsonNode] = {
    val in = getClass.getResourceAsStream("/parity_cases.json")
    assert(in != null, "parity_cases.json missing from test resources")
    new ObjectMapper().readTree(in).elements().asScala.toSeq
  }

  test("extractor agrees with the reference on all fuzz cases") {
    val extractCases = cases.filter(_.get("kind").asText == "extract")
    assert(extractCases.size == 250)
    extractCases.zipWithIndex.foreach { case (c, i) =>
      val text = c.get("text").asText
      val spc = c.get("spc").asInt
      val completion = c.get("completion").asText
      val expected = c.get("entities").elements().asScala.map { e =>
        (e.get(0).asText, e.get(1).asText, e.get(2).asInt, e.get(3).asInt)
      }.toSeq

      val got = MentionExtractor
        .extract(FixedAnnotator(completion), SysPrompt, Cats, text, spc)
        .map(m => (m.category, m.surface, m.begin, m.end))
        .sortBy(m => (m._3, m._1, m._2))

      assert(got == expected,
        s"case $i: text=${text.take(60)} spc=$spc completion=${completion.take(60)}")
    }
  }

  test("token alignment and BIO agree with the reference on all fuzz cases") {
    val bioCases = cases.filter(_.get("kind").asText == "bio")
    assert(bioCases.size == 250)
    bioCases.zipWithIndex.foreach { case (c, i) =>
      val text = c.get("text").asText
      val ents = c.get("entities").elements().asScala.map { e =>
        Mention(e.get(0).asText, e.get(1).asText, e.get(2).asInt, e.get(3).asInt)
      }.toSeq
      val expectedSpans = c.get("token_spans").elements().asScala.map { s =>
        if (s.isNull) None else Some((s.get(0).asInt, s.get(1).asInt))
      }.toSeq
      val expectedBio = c.get("bio").elements().asScala.map(_.asText).toSeq

      val gotSpans = ents.map(e => Tokenize.spanToTokenIndexes(text, e.begin, e.end))
      assert(gotSpans == expectedSpans, s"case $i spans: text=${text.take(60)}")
      assert(Tokenize.bioTags(text, ents).toSeq == expectedBio,
        s"case $i bio: text=${text.take(60)}")
    }
  }
}
