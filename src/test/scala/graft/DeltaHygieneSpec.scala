package graft

import graft.core.SequencePack
import graft.dedup.Dedup
import graft.quality.{LmScore, Pii}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture coverage for the round-5 hygiene operators: incremental
  * delta-dedup against a landed corpus, PII scrubbing, and the unigram-LM
  * quality score (closed-form oracle).
  */
class DeltaHygieneSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-delta-hygiene-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val longA =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon " +
      "phi chi psi omega one two three four five six"

  test("deltaMd5 classifies exact_dup / near_dup / new with min-corpus-doc attribution") {
    import spark.implicits._
    val corpus = Seq(
      (1L, longA),
      (2L, longA), // duplicate inside the corpus: exact_of must pick min id 1
      (3L, "completely different tokens about ships and harbors and tides")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, longA), // exact duplicate of corpus docs 1/2
      (11L, longA.replace("six", "seven")), // near-duplicate (29/31 shingles)
      (12L, "unrelated fresh content never seen before in any landed page")
    ).toDF("doc_id", "text")

    val got = Dedup.deltaMd5(spark, corpus, batch, 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(got(10L) == ("exact_dup", 1L)) // min corpus doc, not 2
    assert(got(11L)._1 == "near_dup")
    assert(got(11L)._2 == 1L)
    assert(got(12L) == ("new", -1L))
    assert(got.size == 3)
  }

  test("deltaMd5: empty-text batch doc matches empty corpus doc exactly, never nearly") {
    import spark.implicits._
    val corpus = Seq((1L, ""), (2L, longA)).toDF("doc_id", "text")
    val batch = Seq((10L, ""), (11L, "   ")).toDF("doc_id", "text")
    val got = Dedup.deltaMd5(spark, corpus, batch, 0.5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(10L) == "exact_dup")
    // whitespace-only differs byte-wise from "" and has no shingles: new
    assert(got(11L) == "new")
  }

  test("Pii.scrub counts and redacts emails, IPv4s, and phone numbers") {
    import spark.implicits._
    val docs = Seq(
      (1L, "reach me at alice.smith+spam@mail-host.example.org or bob@x.io thanks"),
      (2L, "server 10.0.3.77 and backup 192.168.0.1 listen on port eighty"),
      (3L, "call 555-013-8675 today"),
      (4L, "nothing sensitive here at all")
    ).toDF("doc_id", "text")
    val got = Pii.scrub(docs).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
      .toMap
    assert(got(1L) == ((2, 0, 0, "reach me at <EMAIL> or <EMAIL> thanks")))
    assert(got(2L) == ((0, 2, 0, "server <IP> and backup <IP> listen on port eighty")))
    assert(got(3L) == ((0, 0, 1, "call <PHONE> today")))
    assert(got(4L) == ((0, 0, 0, "nothing sensitive here at all")))
  }

  test("unigramLogProb matches the closed-form corpus model") {
    import spark.implicits._
    val docs = Seq((1L, "a a b"), (2L, "b c"), (3L, "   ")).toDF("doc_id", "text")
    val got = LmScore.unigramLogProb(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // counts: a=2 b=2 c=1, N=5
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    assert(got(1L) == ((3L, r4(math.log(2.0 / 5)))))
    assert(got(2L) == ((2L, r4((math.log(2.0 / 5) + math.log(1.0 / 5)) / 2))))
    assert(!got.contains(3L)) // token-free docs carry no score
  }

  test("SequencePack: closed-form offsets, invariant to the bucket count") {
    import spark.implicits._
    val docs = Seq((0L, "a b c"), (1L, "  "), (2L, "d e"), (5L, "f g h i"),
      (9L, "j")).toDF("doc_id", "text")
    def run(buckets: Int) = SequencePack.pack(spark, docs, 4, nBuckets = buckets)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val one = run(1)
    assert(one == run(3)) // distributed prefix sum == single-bucket scan
    val m = one.map(t => t._1 -> t).toMap
    assert(m(0L) == ((0L, 3L, 0L, 0L)))
    assert(m(1L) == ((1L, 0L, 3L, 0L))) // token-free doc keeps its slot, zero width
    assert(m(2L) == ((2L, 2L, 3L, 0L)))
    assert(m(5L) == ((5L, 4L, 5L, 1L)))
    assert(m(9L) == ((9L, 1L, 9L, 2L)))
  }

  test("WeightedSample: closed-form systematic picks, invariant to the bucket count") {
    import spark.implicits._
    import graft.core.WeightedSample
    // weights 3,0,2,4,1 → total 10, n=5 → step 2; stripes end at 2,4,6,8,10
    val wt = Seq((0L, 3L), (1L, 0L), (2L, 2L), (5L, 4L), (9L, 1L))
      .toDF("doc_id", "w")
    def run(buckets: Int) = WeightedSample.systematic(spark, wt, 5,
      nBuckets = buckets).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    val one = run(1)
    assert(one == run(3)) // distributed prefix sum == single-bucket scan
    assert(one == Set(
      (0L, 3L, 0L, true),   // [0,3) crosses 2
      (1L, 0L, 3L, false),  // empty interval: zero weight never picked
      (2L, 2L, 3L, true),   // [3,5) crosses 4
      (5L, 4L, 5L, true),   // [5,9) crosses 6 AND 8 — picked once
      (9L, 1L, 9L, true)))  // [9,10) crosses 10
    // n >= total floors step at 1: every positive-weight row is picked
    val all = WeightedSample.systematic(spark, wt, 100).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(all == Map(0L -> true, 1L -> false, 2L -> true,
      5L -> true, 9L -> true))
  }

  test("unigramLogProb broadcast gate: identical result above and below the vocab cap") {
    import spark.implicits._
    val docs = (1L to 30L).map(i => (i, s"tok$i shared common tok${i % 7}"))
      .toDF("doc_id", "text")
    val small = LmScore.unigramLogProb(docs, maxBroadcastVocab = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val big = LmScore.unigramLogProb(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(small == big)
  }
}
