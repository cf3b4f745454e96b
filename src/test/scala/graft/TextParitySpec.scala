package graft

import graft.core.Mention
import graft.text.{PyStr, Tokenize}
import org.scalatest.funsuite.AnyFunSuite

/** Golden vectors ported from the reference test suite (FIXTURES.md §4):
  * `tests/test_dataset.py:54-119` plus seeded-fuzz properties over the
  * Python-string parity layer. */
class TextParitySpec extends AnyFunSuite {

  // ---- PyStr -------------------------------------------------------------

  test("pySplit matches Python str.split() semantics") {
    assert(PyStr.split("John lives in New York").toSeq ==
      Seq("John", "lives", "in", "New", "York"))
    assert(PyStr.split("The United  States of America").toSeq ==
      Seq("The", "United", "States", "of", "America"))
    assert(PyStr.split("  a\tb\nc  ").toSeq == Seq("a", "b", "c"))
    assert(PyStr.split("").isEmpty)
    assert(PyStr.split("   ").isEmpty)
  }

  test("strip and stripChars match Python semantics") {
    assert(PyStr.strip("  hi\n\t") == "hi")
    assert(PyStr.strip("") == "")
    assert(PyStr.stripChars("<PERSON>", "<>") == "PERSON")
    assert(PyStr.stripChars("<<a>b>>", "<>") == "a>b")
    assert(PyStr.stripChars("plain", "<>") == "plain")
  }

  test("findAll resumes at match end (non-overlapping)") {
    assert(PyStr.findAll("Apple makes great products. I love Apple products.", "Apple").toSeq ==
      Seq((0, 5), (35, 40)))
    assert(PyStr.findAll("aaaa", "aa").toSeq == Seq((0, 2), (2, 4)))
    assert(PyStr.findAll("xyz", "q").isEmpty)
  }

  test("findAll spans slice back to the needle (reference invariant)") {
    // mirrors tests/test_extractor_ner.py:179-182; seeded fuzz, 500 cases
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val alphabet = "ab "
      val text = Seq.fill(rnd.nextInt(40))(alphabet(rnd.nextInt(alphabet.length))).mkString
      val needle = Seq.fill(1 + rnd.nextInt(3))(alphabet(rnd.nextInt(alphabet.length))).mkString
      val spans = PyStr.findAll(text, needle)
      spans.foreach { case (b, e) => assert(text.substring(b, e) == needle) }
      // non-overlapping, strictly increasing, resume-at-end
      spans.sliding(2).foreach {
        case Array((_, e1), (b2, _)) => assert(b2 >= e1)
        case _ =>
      }
    }
  }

  // ---- token alignment (tests/test_dataset.py:54-79) ----------------------

  test("spanToTokenIndexes golden vectors") {
    val t1 = "John lives in New York"
    assert(Tokenize.spanToTokenIndexes(t1, 0, 4) == Some((0, 0)))   // John
    assert(Tokenize.spanToTokenIndexes(t1, 14, 22) == Some((3, 4))) // New York
    assert(Tokenize.spanToTokenIndexes(t1, 5, 10) == Some((1, 1)))  // lives
    val t2 = "The United  States of America" // double space
    assert(Tokenize.spanToTokenIndexes(t2, 4, 18) == Some((1, 2)))  // United  States
    assert(Tokenize.spanToTokenIndexes(t1, 100, 110) == None)       // out of bounds
    assert(Tokenize.spanToTokenIndexes("", 0, 1) == None)           // empty text
  }

  test("spanToTokenIndexes inclusive-end overlap (amiodarone case)") {
    // tests/test_pipeline.py test_real_text_exact_match relies on span
    // (24,34) mapping onto tokens 3..4 of this text
    val t = "The patient was prescribed amiodarone for arrhythmia."
    assert(Tokenize.spanToTokenIndexes(t, 24, 34) == Some((3, 4)))
  }

  // ---- BIO tagging (tests/test_dataset.py:82-119) --------------------------

  test("bioTags golden vectors") {
    assert(Tokenize.bioTags("John lives in New York",
      Seq(Mention("PERSON", "John", 0, 4))).toSeq ==
      Seq("B-PERSON", "O", "O", "O", "O"))

    assert(Tokenize.bioTags("John lives in New York",
      Seq(Mention("PERSON", "John", 0, 4), Mention("LOCATION", "New York", 14, 22))).toSeq ==
      Seq("B-PERSON", "O", "O", "B-LOCATION", "I-LOCATION"))

    assert(Tokenize.bioTags("Hello world", Nil).toSeq == Seq("O", "O"))

    assert(Tokenize.bioTags("Visit New York City",
      Seq(Mention("LOCATION", "New York", 6, 14), Mention("LOCATION", "City", 15, 19))).toSeq ==
      Seq("O", "B-LOCATION", "I-LOCATION", "B-LOCATION"))
  }

  test("bioTags length always equals token count (seeded fuzz)") {
    val rnd = new scala.util.Random(7)
    (1 to 500).foreach { _ =>
      val alphabet = "xy \n\t"
      val text = Seq.fill(rnd.nextInt(60))(alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(Tokenize.bioTags(text, Nil).length == PyStr.split(text).length)
    }
  }
}
