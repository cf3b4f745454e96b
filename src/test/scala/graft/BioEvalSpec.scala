package graft

import graft.core.{Mention, TokenMetrics}
import graft.eval.BioEval
import graft.text.Tokenize
import org.scalatest.funsuite.AnyFunSuite

/** Golden TokenMetrics vectors ported from reference
  * `tests/test_pipeline.py:130-246`. */
class BioEvalSpec extends AnyFunSuite {

  private def m(gold: Seq[String], pred: Seq[String]) =
    BioEval.computeInstanceMetrics(gold, pred)

  test("exact match") {
    assert(m(Seq("O", "B-DISEASE", "I-DISEASE", "O", "B-DRUG", "O"),
             Seq("O", "B-DISEASE", "I-DISEASE", "O", "B-DRUG", "O")) ==
      TokenMetrics(3.0, 0.0, 0.0))
  }

  test("no match") {
    assert(m(Seq("O", "B-DISEASE", "I-DISEASE", "O", "B-DRUG", "O"),
             Seq("O", "O", "O", "O", "O", "O")) == TokenMetrics(0.0, 0.0, 3.0))
  }

  test("partial match same entity (B vs I)") {
    assert(m(Seq("O", "B-DISEASE", "I-DISEASE", "O"),
             Seq("O", "I-DISEASE", "I-DISEASE", "O")) == TokenMetrics(1.5, 0.5, 0.5))
  }

  test("wrong entity type") {
    assert(m(Seq("O", "B-DISEASE", "I-DISEASE", "O"),
             Seq("O", "B-DRUG", "I-DRUG", "O")) == TokenMetrics(0.0, 2.0, 2.0))
  }

  test("mixed scenarios") {
    assert(m(Seq("O", "B-DISEASE", "I-DISEASE", "O", "B-DRUG", "O"),
             Seq("O", "B-DISEASE", "O", "O", "B-SYMPTOM", "O")) ==
      TokenMetrics(1.0, 1.0, 2.0))
  }

  test("all O") {
    assert(m(Seq("O", "O", "O"), Seq("O", "O", "O")) == TokenMetrics(0.0, 0.0, 0.0))
  }

  test("length mismatch raises") {
    intercept[AssertionError] {
      m(Seq("O", "B-DISEASE", "I-DISEASE", "O", "B-DRUG", "O"), Seq("O", "B-DISEASE", "O"))
    }
  }

  test("single token exact match") {
    assert(m(Seq("O", "O", "B-FARMACO", "O", "O"),
             Seq("O", "O", "B-FARMACO", "O", "O")) == TokenMetrics(1.0, 0.0, 0.0))
  }

  test("real text exact match (amiodarone)") {
    val text = "The patient was prescribed amiodarone for arrhythmia."
    val gold = Tokenize.bioTags(text, Seq(Mention("FARMACO", "amiodarone", 24, 34)))
    val pred = Tokenize.bioTags(text, Seq(Mention("FARMACO", "amiodarone", 24, 34)))
    assert(m(gold.toSeq, pred.toSeq) == TokenMetrics(2.0, 0.0, 0.0))
  }

  test("zero-guarded F1") {
    val z = BioEval.f1(0, 0, 0)
    assert(z.precision == 0.0 && z.recall == 0.0 && z.f1 == 0.0)
    val p = BioEval.f1(3, 1, 1)
    assert(math.abs(p.precision - 0.75) < 1e-12)
    assert(math.abs(p.recall - 0.75) < 1e-12)
    assert(math.abs(p.f1 - 0.75) < 1e-12)
  }
}
