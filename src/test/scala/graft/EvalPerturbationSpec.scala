package graft

import graft.ner.NerSpark
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end evaluator checks with IMPERFECT predictions (FIXTURES.md §2:
  * perturbed rows give known-in-advance micro/macro metrics). Hand-computed
  * expectations follow the reference scoring exactly. */
class EvalPerturbationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-eval-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("micro metrics with dropped and spurious mentions") {
    import spark.implicits._
    // doc 1: "spark does merge work" — gold: spark(TOOL,0,5), merge(OPERATION,11,16)
    //        pred misses merge                       → fn += 1
    // doc 2: "the customer row" — gold: customer(ACTOR,4,12)
    //        pred adds spurious row(DATA,13,16)      → fp += 1; customer tp += 1
    val docs = Seq((1L, "spark does merge work"), (2L, "the customer row"))
      .toDF("doc_id", "text")
    val gold = Seq(
      (1L, "TOOL", "spark", 0, 5),
      (1L, "OPERATION", "merge", 11, 16),
      (2L, "ACTOR", "customer", 4, 12))
      .toDF("doc_id", "category", "surface", "begin_c", "end_c")
    val pred = Seq(
      (1L, "TOOL", "spark", 0, 5),
      (2L, "ACTOR", "customer", 4, 12),
      (2L, "DATA", "row", 13, 16))
      .toDF("doc_id", "category", "surface", "begin_c", "end_c")

    val r = NerSpark.microMetrics(spark, docs, gold, pred).head()
    assert(r.getAs[Double]("tp") == 2.0)
    assert(r.getAs[Double]("fp") == 1.0)
    assert(r.getAs[Double]("fn") == 1.0)
    assert(math.abs(r.getAs[Double]("precision") - 2.0 / 3.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("recall") - 2.0 / 3.0) < 1e-12)
  }

  test("micro metrics with wrong category and B/I partial match") {
    import spark.implicits._
    // doc 1: wrong category on "spark": gold TOOL vs pred DATA → fp+=1, fn+=1
    // doc 2: "hash join" gold spans both tokens; pred covers only "join"
    //        (begin 5) → gold [B-OPERATION, I-OPERATION], pred [O, B-OPERATION]
    //        token 1: gold-only → fn+=1; token 2: B vs I same cat → tp+=.5,fp+=.5,fn+=.5
    val docs = Seq((1L, "spark"), (2L, "hash join"))
      .toDF("doc_id", "text")
    val gold = Seq(
      (1L, "TOOL", "spark", 0, 5),
      (2L, "OPERATION", "hash join", 0, 9))
      .toDF("doc_id", "category", "surface", "begin_c", "end_c")
    val pred = Seq(
      (1L, "DATA", "spark", 0, 5),
      (2L, "OPERATION", "join", 5, 9))
      .toDF("doc_id", "category", "surface", "begin_c", "end_c")

    val r = NerSpark.microMetrics(spark, docs, gold, pred).head()
    assert(r.getAs[Double]("tp") == 0.5)
    assert(r.getAs[Double]("fp") == 1.5)
    assert(r.getAs[Double]("fn") == 2.5)
  }

  test("macro metrics average per-document scores") {
    import spark.implicits._
    // doc 1 perfect (P=R=F1=1), doc 2 empty pred vs one gold (P=R=F1=0)
    val docs = Seq((1L, "spark"), (2L, "merge")).toDF("doc_id", "text")
    val gold = Seq(
      (1L, "TOOL", "spark", 0, 5),
      (2L, "OPERATION", "merge", 0, 5))
      .toDF("doc_id", "category", "surface", "begin_c", "end_c")
    val pred = Seq((1L, "TOOL", "spark", 0, 5))
      .toDF("doc_id", "category", "surface", "begin_c", "end_c")
    val r = NerSpark.macroMetrics(spark, docs, gold, pred).head()
    assert(r.getAs[Double]("macro_precision") == 0.5)
    assert(r.getAs[Double]("macro_recall") == 0.5)
    assert(r.getAs[Double]("macro_f1") == 0.5)
  }
}
