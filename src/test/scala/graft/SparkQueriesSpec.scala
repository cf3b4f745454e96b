package graft

import graft.kg.ConnectedComponents
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Integration checks of the SparkEntry query surface at sf0.001; the
  * DuckDB oracle equivalence is driver-run (and locally via
  * scripts/check_oracles.py) — these specs pin the engine-side invariants. */
class SparkQueriesSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("entry (flagship KG pipeline) returns triples") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.toSeq == Seq("subj", "pred", "obj"))
    assert(df.count() > 0)
  }

  test("every registered query runs and q07/q10/q12 are non-empty at sf0.001") {
    val counts = SparkEntry.queries.map { case (name, fn) => name -> fn(spark, sf).count() }
    counts.foreach { case (n, c) => assert(c >= 0, s"$n failed") }
    assert(counts("q10_ner_mentions") > 0)
    assert(counts("q12_triples") > 0)
  }

  test("q10 mention spans slice back to their surface (grounding invariant)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    val m = SparkEntry.queries("q10_ner_mentions")(spark, sf)
    val bad = m.join(docs, "doc_id")
      .filter(expr("substring(text, begin_c + 1, end_c - begin_c) != surface"))
      .count()
    assert(bad == 0)
  }

  test("q11 micro metrics are perfect when pred == gold") {
    val r = SparkEntry.queries("q11_ner_micro")(spark, sf).head()
    assert(r.getAs[Double]("fp") == 0.0)
    assert(r.getAs[Double]("fn") == 0.0)
    assert(r.getAs[Double]("tp") > 0.0)
    assert(r.getAs[Double]("f1") == 1.0)
  }

  test("salted join equals plain join") {
    import graft.kg.Kg
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val salted = Kg.saltedJoin(li, o, "l_orderkey", "o_orderkey",
      pmod(hash(col("l_partkey"), col("l_suppkey")), lit(8)), 8).count()
    val plain = li.join(o, li("l_orderkey") === o("o_orderkey")).count()
    assert(salted == plain)
  }

  test("connected components on a known graph") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("b", "c"), ("d", "e"), ("f", "f"))
      .toDF("src", "dst")
    val got = ConnectedComponents.run(spark, edges)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "d", "e" -> "d", "f" -> "f"))
  }

  test("connected components on a chain needs multiple iterations") {
    import spark.implicits._
    val chain = (0 until 12).map(i => (f"n$i%02d", f"n${i + 1}%02d")).toDF("src", "dst")
    val got = ConnectedComponents.run(spark, chain).collect()
    assert(got.forall(_.getString(1) == "n00"))
    assert(got.length == 13)
  }

  test("minhash pairs are ordered, deduped, and in [0,1]") {
    val p = SparkEntry.queries("q15_minhash_pairs")(spark, sf).collect()
    p.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      val j = r.getDouble(2)
      assert(j >= 0.0 && j <= 1.0)
    }
    assert(p.map(r => (r.getLong(0), r.getLong(1))).distinct.length == p.length)
  }

  test("minhash estimate tracks exact jaccard on planted near-dups") {
    import spark.implicits._
    import graft.dedup.Dedup
    val base = "the fast key order sort table scan merge part window small hash scan join"
    val docs = Seq(
      (1L, base),
      (2L, base + " extra"),          // near-dup of 1
      (3L, "completely different words entirely unrelated content here"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(spark, docs, 0.3).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
    assert(!pairs.exists(r => r.getLong(1) == 3L))
    val exact = Dedup.exactJaccard(spark, docs,
      Seq((1L, 2L)).toDF("doc_a", "doc_b")).head().getDouble(2)
    val est = pairs.find(r => r.getLong(0) == 1L).get.getDouble(2)
    assert(math.abs(est - exact) < 0.25)
  }

  test("ann top-k: query vector is its own nearest neighbor") {
    val top = SparkEntry.queries("q18_ann_topk")(spark, sf).collect()
    assert(top.head.getLong(0) == 0L)
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-6)
    val sims = top.map(_.getDouble(1)).toSeq
    assert(sims == sims.sorted.reverse)
  }

  test("lsh ann agrees with brute force on the top hit") {
    val bf = SparkEntry.queries("q18_ann_topk")(spark, sf).collect()
    val lsh = SparkEntry.queries("q19_ann_lsh")(spark, sf).collect()
    assert(lsh.head.getLong(0) == bf.head.getLong(0))
  }

  test("sketches: HLL++ distinct and approx percentile land within tolerance") {
    import org.apache.spark.sql.functions._
    // the 100 TB path uses sketches where exact aggregation would shuffle
    // the world; at test scale both are computable, so pin the error bound
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val r = li.agg(
      countDistinct(col("l_orderkey")).as("exact"),
      approx_count_distinct(col("l_orderkey"), 0.02).as("approx"),
      expr("percentile(l_extendedprice, 0.5)").as("p50_exact"),
      expr("percentile_approx(l_extendedprice, 0.5, 10000)").as("p50_approx"))
      .head()
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"HLL++ off by >5%: exact=$exact approx=$approx")
    val (pe, pa) = (r.getDouble(2), r.getDouble(3))
    assert(math.abs(pa - pe) / pe < 0.01, s"percentile sketch off: $pe vs $pa")
  }

  test("q58 interval join plans as an equi-join (no nested-loop, no cartesian)") {
    val df = SparkEntry.queries("q58_interval_join")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"bin-bucketing must yield an equi-join plan:\n$plan")
    // every attributed error really sits inside its session's interval
    val bad = df.filter(col("err_sec") < col("s_start") ||
      col("err_sec") > col("s_end")).count()
    assert(bad == 0)
  }
}
