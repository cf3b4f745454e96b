package graft

import graft.annotate.{Annotator, DictAnnotator, LrmStrip, MentionExtractor, Prompts, ThinkingAnnotator}
import graft.core.{Category, Mention}
import org.scalatest.funsuite.AnyFunSuite

/** Ports of reference `tests/test_extractor_ner.py` (mocked-LLM golden
  * tests — the entity-span exact-match tests the north star requires). */
class ExtractorSpec extends AnyFunSuite {

  private case class FixedAnnotator(response: String) extends Annotator {
    override def generate(systemPrompt: String, userPrompt: String): String = response
  }

  private val enPrompt = Prompts.systemPrompt("en", Seq(Category("X", "y")))

  test("basic entity extraction (test_extract_entities_basic)") {
    val categories = Seq(Category("PERSON", "Names of people"),
                         Category("ORG", "Names of organizations"))
    val text = "John works at Google and Mary works at Apple."
    val ann = FixedAnnotator("<PERSON>:John\n<PERSON>:Mary\n<ORG>:Google\n<ORG>:Apple")
    val got = MentionExtractor.extract(ann, enPrompt, categories, text)
    assert(got == Seq(
      Mention("PERSON", "John", 0, 4),
      Mention("ORG", "Google", 14, 20),
      Mention("PERSON", "Mary", 25, 29),
      Mention("ORG", "Apple", 39, 44)))
  }

  test("single entity (test_extract_entities_with_examples)") {
    val categories = Seq(Category("PRODUCT", "Names of products"))
    val text = "The new iPhone 15 Pro is amazing"
    val got = MentionExtractor.extract(FixedAnnotator("<PRODUCT>:iPhone 15 Pro"),
      enPrompt, categories, text)
    assert(got == Seq(Mention("PRODUCT", "iPhone 15 Pro", 8, 21)))
  }

  test("multiple occurrences (test_multiple_occurrences)") {
    val categories = Seq(Category("COMPANY", "Names of companies"))
    val text = "Apple makes great products. I love Apple products."
    val got = MentionExtractor.extract(FixedAnnotator("<COMPANY>:Apple\n<COMPANY>:Apple"),
      enPrompt, categories, text)
    assert(got == Seq(Mention("COMPANY", "Apple", 0, 5), Mention("COMPANY", "Apple", 35, 40)))
  }

  test("non-whitelisted categories and blank entities are dropped") {
    val categories = Seq(Category("ORG", "orgs"))
    val text = "Google hired nobody."
    val got = MentionExtractor.extract(
      FixedAnnotator("<ORG>:Google\n<PERSON>:nobody\nmalformed line\n<ORG>:   \nNone"),
      enPrompt, categories, text)
    assert(got == Seq(Mention("ORG", "Google", 0, 6)))
  }

  test("'None' completion yields no entities") {
    val got = MentionExtractor.extract(FixedAnnotator("None"),
      enPrompt, Seq(Category("ORG", "orgs")), "Plain text.")
    assert(got.isEmpty)
  }

  test("segmentation preserves offsets (extractor_ner.py:57-67 loop)") {
    val text = "alpha beta\n\n gamma\ndelta"
    assert(MentionExtractor.segment(text, 1) ==
      Seq(("alpha beta", 0), ("", 11), ("gamma", 12), ("delta", 19)))
    assert(MentionExtractor.segment(text, 0) == Seq((text, 0)))
    assert(MentionExtractor.segment("ends with newline\n", 2) ==
      Seq(("ends with newline", 0)))
  }

  test("batched calls see sentencesPerCall segments joined by newline") {
    val calls = scala.collection.mutable.ArrayBuffer.empty[String]
    val spy = new Annotator {
      override def generate(sys: String, user: String): String = { calls += user; "None" }
    }
    val text = "s1\ns2\ns3\ns4\ns5"
    MentionExtractor.extract(spy, enPrompt, Seq(Category("C", "c")), text, sentencesPerCall = 2)
    assert(calls.toSeq == Seq("s1\ns2", "s3\ns4", "s5"))
  }

  test("dict annotator + thinking strip round-trips") {
    val dict = Seq(("TOOL", "spark"), ("OP", "hash join"))
    val inner = DictAnnotator(dict)
    assert(inner.generate("", "use spark for the hash join") == "<TOOL>:spark\n<OP>:hash join")
    assert(inner.generate("", "nothing here") == "None")
    val wrapped = ThinkingAnnotator(inner).generate("", "use spark")
    assert(wrapped.startsWith("<think>"))
    assert(LrmStrip(wrapped) == "<TOOL>:spark")

    val got = MentionExtractor.extract(ThinkingAnnotator(inner), enPrompt,
      Seq(Category("TOOL", "t"), Category("OP", "o")),
      "spark does a hash join then spark again", stripThinking = true)
    assert(got == Seq(
      Mention("TOOL", "spark", 0, 5),
      Mention("OP", "hash join", 13, 22),
      Mention("TOOL", "spark", 28, 33)))
  }

  test("prompt assembly byte parity pieces") {
    val sp = Prompts.systemPrompt("en",
      Seq(Category("PERSON", "Names of people"), Category("ORG", "Orgs")))
    assert(sp.startsWith("\n        \n"))
    assert(sp.contains("PERSON: Names of people\nORG: Orgs"))
    assert(sp.contains("return \"None\" and nothing more"))
    assert(sp.endsWith("at all times.\n\n        "))
    assert(!sp.contains("{categories}"))
    // empty example prompt is falsy in Python — same branch as None
    assert(Prompts.rawTemplate("en", Some("")) == Prompts.rawTemplate("en", None))
    assert(Prompts.systemPrompt("es", Seq(Category("A", "b"))).contains("Ninguna"))
    assert(Prompts.systemPrompt("it", Seq(Category("A", "b"))).contains("Nessuna"))
  }

  test("few-shot example branch matches the reference f-string byte-for-byte") {
    // md5 goldens computed by running the REAL reference assembly
    // (ai/extractor_ner.py:23-35 f-strings + {categories} substitution)
    // with this example and category list; empty example == no example
    // (Python truthiness) is covered by the shared 'empty' hash.
    val example = "Example:\nInput: John works at Acme\nOutput:\n<PERSON>:John\n<ORG>:Acme"
    val cats = Seq(Category("TOOL", "tools for data"), Category("OPERATION", "operations on data"))
    def md5(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val goldens = Map(
      ("en", Some(example)) -> "707c69f8b4dda0afe39bfabcdd849b92",
      ("en", None) -> "cac302317481e96260a908eace5dcee8",
      ("es", Some(example)) -> "c3fb41ae8e03d7184361fcfa9dfb0409",
      ("es", None) -> "0b87d1ea83c7df230ffbd626f35daeb4",
      ("it", Some(example)) -> "06f39fdb9af9d93950766f8f5b192111",
      ("it", None) -> "9d3560aa8675f1d8b5ad750ade9fbdee")
    goldens.foreach { case ((lang, ex), expected) =>
      assert(md5(Prompts.systemPrompt(lang, cats, ex)) == expected, s"$lang example=$ex")
      assert(md5(Prompts.systemPrompt(lang, cats, ex.map(_ => ""))) ==
        goldens((lang, None)), s"$lang empty-example must take the no-example branch")
    }
  }
}
