package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input guards (the round-6 ADVICE batch): every operator
  * below must fail LOUDLY (or return a typed empty frame) on inputs that
  * previously corrupted silently or threw a bare NPE far from the cause. */
class GuardSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-guard-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("prefixOffsets: a negative weight fails loudly, not silently") {
    import spark.implicits._
    val wt = Seq((1L, 5L), (2L, -3L), (3L, 4L)).toDF("doc_id", "w")
    val e = intercept[Exception] {
      graft.core.SequencePack.prefixOffsets(spark, wt).collect()
    }
    assert(e.getMessage != null)
    // the raise_error text names the offending doc
    assert(findMessage(e).contains("negative weight"))
  }

  test("prefixOffsets: non-negative weights still flow unchanged") {
    import spark.implicits._
    val wt = Seq((1L, 5L), (2L, 0L), (3L, 4L)).toDF("doc_id", "w")
    val got = graft.core.SequencePack.prefixOffsets(spark, wt)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 0L, 2L -> 5L, 3L -> 5L))
  }

  test("Mis: node ids outside [0, 2^31) are rejected with the contract named") {
    import spark.implicits._
    val bad = Seq((2147483648L, 1L)).toDF("u", "v")
    val e = intercept[Exception] {
      graft.kg.Mis.misWithRounds(spark, bad)
    }
    assert(findMessage(e).contains("31-bit"))
  }

  test("EquiDepth: empty input returns the empty histogram, not an NPE") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Double)].toDF("id", "x")
    val got = graft.core.EquiDepth.histogram(empty, "x", 4)
    assert(got.columns.toSeq ==
      Seq("bucket", "n", "ndv", "min_v", "max_v"))
    assert(got.count() == 0L)
  }

  test("Scc.bowtie: edgeless input returns the empty classification") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    val got = graft.kg.Scc.bowtie(spark, empty)
    assert(got.columns.toSeq == Seq("node", "region"))
    assert(got.count() == 0L)
  }

  test("Fusion.iterativeTruthMicro: empty claims refuse loudly") {
    import spark.implicits._
    val empty = Seq.empty[(String, String, String, String)]
      .toDF("subj", "pred", "obj", "source")
    val e = intercept[IllegalArgumentException] {
      graft.kg.Fusion.iterativeTruthMicro(empty, 2)
    }
    assert(e.getMessage.contains("at least one claim"))
  }

  /** Walk the cause chain collecting every message — Spark wraps
    * raise_error in SparkException layers whose depth varies by path. */
  private def findMessage(e: Throwable): String = {
    var cur: Throwable = e
    val sb = new StringBuilder
    while (cur != null) {
      if (cur.getMessage != null) sb.append(cur.getMessage).append('\n')
      cur = cur.getCause
    }
    sb.toString
  }
}
