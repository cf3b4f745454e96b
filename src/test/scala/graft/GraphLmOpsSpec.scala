package graft

import graft.kg.{ClusteringCoeff, LabelProp, LinkPredict, PageRank}
import graft.quality.{LmScore, VocabGrowth}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture coverage for the round-5 graph/LM additions: local
  * clustering coefficient, synchronous label propagation, bigram-LM
  * scoring, the Heaps-law vocabulary curve, personalized PageRank, and
  * the data-relative link-prediction hub cap. */
class GraphLmOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-graphlm-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("u", "v")
  }

  test("clustering coefficient: triangle with a pendant") {
    // K3 {1,2,3} plus pendant 4 hanging off 3
    val got = ClusteringCoeff.run(spark, edges(1L -> 2L, 1L -> 3L, 2L -> 3L, 3L -> 4L))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got(1L) == ((2L, 1L, 1.0)))
    assert(got(2L) == ((2L, 1L, 1.0)))
    assert(got(3L) == ((3L, 1L, 0.3333))) // 2·1/(3·2)
    assert(got(4L) == ((1L, 0L, 0.0))) // degree-1: no wedge possible
  }

  test("label propagation: cliques converge to their min label") {
    // two disjoint K3s — each converges to its own min label in 2 rounds
    val two = LabelProp.run(spark,
      edges(1L -> 2L, 1L -> 3L, 2L -> 3L, 7L -> 8L, 7L -> 9L, 8L -> 9L), 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L, 9L -> 7L))
    // round 1 of K3 is the documented tie case: node 1 sees {2,3} (one
    // vote each) and takes the SMALLER label 2 — synchronous semantics
    val r1 = LabelProp.run(spark, edges(1L -> 2L, 1L -> 3L, 2L -> 3L), 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
  }

  test("bigram log-prob matches the hand-computed add-1 model") {
    import spark.implicits._
    val docs = Seq((1L, "a b a"), (2L, "b a"), (3L, "c"))
      .toDF("doc_id", "text")
    val got = LmScore.bigramLogProb(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // corpus: cb(a,b)=1 cb(b,a)=2; cu(a)=1 cu(b)=2; V=3
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((2L,
      r4((math.log(2.0 / 4) + math.log(3.0 / 5)) / 2))))
    assert(got(2L) == ((1L, r4(math.log(3.0 / 5)))))
    assert(!got.contains(3L)) // single-token doc has no bigram
    assert(got.size == 2)
  }

  test("heaps curve: cumulative counts and the fitted slope") {
    import spark.implicits._
    val docs = Seq((0L, "a b"), (1L, "b c b"), (2L, "a"), (3L, " "))
      .toDF("doc_id", "text")
    val rows = VocabGrowth.heapsCurve(spark, docs, nBuckets = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq((0L, 2L, 2L), (1L, 5L, 3L), (2L, 6L, 3L), (3L, 6L, 3L)))
    // expected beta: closed-form least squares over the ln-ln points of
    // the token-bearing prefix rows (cum_tokens > 0 keeps all four here)
    val pts = rows.map(t => (math.log(t._2.toDouble), math.log(t._3.toDouble)))
    val n = pts.length
    val (mx, my) = (pts.map(_._1).sum / n, pts.map(_._2).sum / n)
    val beta = pts.map(p => (p._1 - mx) * (p._2 - my)).sum /
      pts.map(p => (p._1 - mx) * (p._1 - mx)).sum
    val want = BigDecimal(beta).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows.forall(_._4 == want))
  }

  test("personalized PageRank concentrates teleport mass on the seed") {
    import spark.implicits._
    val e = Seq(("1", "2"), ("2", "1")).toDF("src", "dst")
    val got = PageRank.personalized(spark, e, Seq("1").toDF("node"), 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // r0 = (1, 0); one round: r(1) = 0.15·1 + 0.85·0, r(2) = 0 + 0.85·1
    assert(got == Map("1" -> 0.15, "2" -> 0.85))
    // two seeds split the teleport mass
    val both = PageRank.personalized(spark, e, Seq("1", "2").toDF("node"), 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(both == Map("1" -> 0.5, "2" -> 0.5)) // symmetric fixpoint
  }

  test("HITS: exact integer micros, max-normalized, bipartite separation") {
    import spark.implicits._
    // h1 grounds both pages, h2 only the shared one → h1 is the stronger
    // hub, a1 the stronger authority
    val e = Seq(("h1", "a1"), ("h1", "a2"), ("h2", "a1")).toDF("src", "dst")
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // one round: auth a1=1e6, a2 = 1e12 div 2e6 = 500000;
    // hub h1=1e6, h2 = 1e12 div 1.5e6 = 666666 (integer floor)
    assert(asMap(kg.Hits.run(e, 1)) == Map(
      "h1" -> ((1000000L, 0L)), "h2" -> ((666666L, 0L)),
      "a1" -> ((0L, 1000000L)), "a2" -> ((0L, 500000L))))
    // three rounds pin the full integer-division chain
    val r3 = asMap(kg.Hits.run(e, 3))
    assert(r3("h2") == ((619047L, 0L)) && r3("a2") == ((0L, 615384L)))
    assert(r3("h1") == ((1000000L, 0L)) && r3("a1") == ((0L, 1000000L)))
  }

  test("predicate profile counts triples, distincts, and fanout") {
    import spark.implicits._
    val tr = Seq(("s1", "p", "o1"), ("s1", "p", "o2"), ("s2", "p", "o1"),
      ("s1", "q", "o3")).toDF("subj", "pred", "obj")
    val got = kg.Ontology.predicateProfile(tr).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got("p") == ((3L, 2L, 2L, 1.5)))
    assert(got("q") == ((1L, 1L, 1L, 1.0)))
  }

  test("assortativity: a star is perfectly disassortative") {
    // K1,3: every edge joins the degree-3 hub to a degree-1 leaf → r = −1
    val row = kg.Assortativity.run(edges(1L -> 2L, 1L -> 3L, 1L -> 4L)).head()
    assert(row.getLong(0) == 3L)
    assert(row.getDouble(1) == -1.0)
  }

  test("perplexity buckets partition the corpus with ordered ranges") {
    import spark.implicits._
    // four distinct score levels: rarer tokens ⇒ lower mean logprob
    val docs = Seq((1L, "a a a a"), (2L, "a a b b"), (3L, "b c"), (4L, "d"))
      .toDF("doc_id", "text")
    val rows = LmScore.perplexityBuckets(docs, 2).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.map(_._2).sum == 4L) // every doc lands in exactly one bucket
    assert(rows.map(_._1).toSeq == Seq(0, 1))
    // ranges are disjoint and ordered: everything in bucket 0 scores below
    // everything in bucket 1
    assert(rows(0)._4 < rows(1)._3)
  }

  test("community rollup reports size, internal edges, and density") {
    val canon = edges(1L -> 2L, 1L -> 3L, 2L -> 3L, 7L -> 8L, 7L -> 9L, 8L -> 9L)
    val got = LabelProp.communityRollup(LabelProp.run(spark, canon, 2), canon)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got == Map(1L -> ((3L, 3L, 1.0)), 7L -> ((3L, 3L, 1.0))))
  }

  test("domain audit flags only subjects missing the declared type") {
    import spark.implicits._
    val triples = Seq(
      ("e1", "uses_tool", "o1"), ("e1", "uses_tool", "o2"), // e1 IS an Artifact
      ("e2", "performs", "o1"), // e2 is an Event, declared domain says Agent
      ("e3", "involves", "o3")) // e3 has NO type rows at all
      .toDF("subj", "pred", "obj")
    val types = Seq(("e1", "TOOL"), ("e1", "Artifact"), ("e1", "Thing"),
      ("e2", "OPERATION"), ("e2", "Event"), ("e2", "Thing"))
      .toDF("entity_id", "type")
    val domains = Seq("uses_tool" -> "Artifact", "performs" -> "Agent",
      "involves" -> "Agent")
    val got = kg.Ontology.domainViolations(spark, triples, types, domains)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getString(2), r.getLong(3))))
      .toMap
    assert(got == Map(
      ("e2", "performs") -> (("Agent", 1L)),
      ("e3", "involves") -> (("Agent", 1L))))
  }

  test("containment finds a quoted doc that Jaccard-level overlap would miss") {
    import spark.implicits._
    // doc 2 is wholly contained in doc 1 (ov_b = 1.0) but Jaccard is low;
    // doc 3 shares nothing after the stop-shingle cap ('x y' repeated in
    // all docs would be capped if df exceeded the corpus-relative bound)
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "c d e"),
      (3L, "p q r s")).toDF("doc_id", "text")
    val got = dedup.Dedup.containmentPairs(docs, dfCapPercent = 100, minOverlap = 0.9)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    // doc1 has 7 distinct bigrams, doc2 has 2 ('c d','d e'), both inside doc1
    assert(got == Map((1L, 2L) -> ((2L, 7L, 2L, 0.2857, 1.0))))
    // a 0% cap drops every shingle → no pairs, not a crash
    assert(dedup.Dedup.containmentPairs(docs, 0L, 0.9).count() == 0L)
  }

  test("prefix-filtered containment equals the direct posting join") {
    import spark.implicits._
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))).toSet
    // goldens: the quoted-doc case at two thresholds + the 0% cap edge
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "c d e"),
      (3L, "p q r s")).toDF("doc_id", "text")
    for (t <- Seq(0.9, 0.2))
      assert(rows(dedup.Dedup.containmentPairsPrefix(docs, 100, t)) ==
        rows(dedup.Dedup.containmentPairs(docs, 100, t)))
    assert(dedup.Dedup.containmentPairsPrefix(docs, 0L, 0.9).count() == 0L)
    // adversarial cross-check: a low-cardinality vocabulary (the q99
    // worst case) with a seeded generator — every (cap, threshold)
    // combination must agree exactly, including boundary thresholds
    // where HALF_UP rounding decides membership
    val rnd = new scala.util.Random(7)
    val vocab = Array("u", "v", "w", "x", "y", "z")
    val fuzz = (1L to 40L).map { i =>
      val n = 2 + rnd.nextInt(12)
      (i, Array.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }.toDF("doc_id", "text")
    for (cap <- Seq(100L, 40L); t <- Seq(0.5, 0.3333, 1.0)) {
      val naive = rows(dedup.Dedup.containmentPairs(fuzz, cap, t))
      val pref = rows(dedup.Dedup.containmentPairsPrefix(fuzz, cap, t))
      assert(pref == naive, s"cap=$cap t=$t: prefix=$pref naive=$naive")
      // the adaptive chooser must land on the same rows whichever
      // branch its measured stats pick
      assert(rows(dedup.Dedup.containmentPairsAdaptive(fuzz, cap, t)) == naive)
    }
  }

  test("containment cost model picks direct on dense, prefix on junk-shingle stats") {
    // dense regime — the sf0.1 synthetic corpus's measured shape:
    // Σdf² 72M, prefix candidates ≈ all 12.5M pairs, avg 51 postings/doc
    // → verify re-enumerates everything, direct wins (measured 36 vs 55 s)
    assert(dedup.Dedup.preferDirectContainment(
      sumDf2 = 72_000_000L, candRows = 21_000_000L,
      maxPairs = 12_497_500L, avgPostingsPerDoc = 51.0))
    // junk-mid-df regime: a few df≈10k boilerplate shingles under the
    // cap drive Σdf² to 500M, but typical docs' prefixes are near-unique
    // so the candidate join measures tiny → prefix wins
    assert(!dedup.Dedup.preferDirectContainment(
      sumDf2 = 500_000_000L, candRows = 1_000_000L,
      maxPairs = 499_999_500_000L, avgPostingsPerDoc = 50.0))
  }

  test("degenerate corpora: empty cutpoints and a NULL Heaps beta, no NPE") {
    import spark.implicits._
    val blank = Seq((1L, " "), (2L, "")).toDF("doc_id", "text")
    // no scored docs → percentile is NULL → empty cutpoint list
    assert(LmScore.scoreCutpoints(blank, 4).isEmpty)
    assert(LmScore.bucketsAt(blank, Seq.empty).count() == 0L)
    // one token-bearing doc → constant ln(cum_tokens) margin → NULL beta,
    // curve rows still emitted (matching the SQL replay's NULL column)
    val one = Seq((1L, "a b"), (2L, " ")).toDF("doc_id", "text")
    val rows = quality.VocabGrowth.heapsCurve(spark, one, nBuckets = 2).collect()
    assert(rows.length == 2)
    assert(rows.forall(_.isNullAt(3)))
  }

  test("incremental CC equals a full recompute after a merging delta") {
    import spark.implicits._
    val old = Seq((1L, 2L), (3L, 4L)).toDF("src", "dst")
    val oldLabels = kg.ConnectedComponents.runStar(spark, old)
    assert(oldLabels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
    // delta bridges the two components AND lands a brand-new pair
    val delta = Seq((2L, 3L), (5L, 6L)).toDF("src", "dst")
    val inc = kg.ConnectedComponents.incremental(spark, oldLabels, delta)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L, 6L -> 5L))
    // the invariant: indistinguishable from batch CC over old ∪ delta
    val full = kg.ConnectedComponents.run(spark, old.union(delta))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == full)
  }

  test("degree histogram buckets by exact bit length") {
    // K1,3: hub degree 3 → bucket 1; three leaves degree 1 → bucket 0
    val got = kg.Assortativity.degreeHistogram(edges(1L -> 2L, 1L -> 3L, 1L -> 4L))
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map(0 -> ((3L, 1L, 1L)), 1 -> ((1L, 3L, 3L))))
  }

  test("predicate alignment recovers a rename from shared facts only") {
    import spark.implicits._
    // A asserts p over 3 facts; B renames p→q but only saw 2 of them,
    // plus one fact A never saw. Unrelated r/s share nothing.
    val a = Seq(("s1", "p", "o1"), ("s2", "p", "o2"), ("s3", "p", "o3"),
      ("s9", "r", "o9")).toDF("subj", "pred", "obj")
    val b = Seq(("s1", "q", "o1"), ("s2", "q", "o2"), ("s4", "q", "o4"),
      ("s8", "s", "o8")).toDF("subj", "pred", "obj")
    val got = kg.Ontology.alignPredicates(a, b).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // only the truly-aligned pair co-occurs: |A_p|=3, |B_q|=3, both=2,
    // jaccard = 2/(3+3-2) = 0.5; r/s never surface
    assert(got == Map(("p", "q") -> ((3L, 3L, 2L, 0.5))))
  }

  test("alignment counts distinct facts, not re-assertions") {
    import spark.implicits._
    val a = Seq(("s1", "p", "o1"), ("s1", "p", "o1")).toDF("subj", "pred", "obj")
    val b = Seq(("s1", "q", "o1")).toDF("subj", "pred", "obj")
    val row = kg.Ontology.alignPredicates(a, b).head()
    assert((row.getLong(2), row.getLong(3), row.getLong(4), row.getDouble(5))
      == ((1L, 1L, 1L, 1.0)))
  }

  test("inverse detection recovers a reversal from instance evidence only") {
    import spark.implicits._
    // p has 2 facts; q asserts the REVERSAL of one of them. r is noise.
    val tr = Seq(("s1", "p", "o1"), ("s2", "p", "o2"),
      ("o1", "q", "s1"), ("s9", "r", "o9")).toDF("subj", "pred", "obj")
    val got = kg.Ontology.inversePairs(tr).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // ordered pairs both ways; jaccard = 1/(2+1-1) = 0.5; r never surfaces
    assert(got == Map(
      ("p", "q") -> ((2L, 1L, 1L, 0.5)),
      ("q", "p") -> ((1L, 2L, 1L, 0.5))))
  }

  test("a symmetric predicate scores 1.0 against itself on the diagonal") {
    import spark.implicits._
    val tr = Seq(("a", "m", "b"), ("b", "m", "a")).toDF("subj", "pred", "obj")
    val got = kg.Ontology.inversePairs(tr).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got == Map(("m", "m") -> ((2L, 2L, 2L, 1.0))))
  }

  test("inverse enrichment materializes the missing reversals only") {
    import spark.implicits._
    // (p, q) are inverses with jaccard 0.5 each way; only o2's reversal
    // is missing, so exactly one inferred row appears under q
    val tr = Seq(("s1", "p", "o1"), ("s2", "p", "o2"), ("o1", "q", "s1"))
      .toDF("subj", "pred", "obj")
    val got = kg.Ontology.enrichInverses(tr, minJaccard = 0.4).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3))).toSet
    assert(got == Set(
      ("s1", "p", "o1", "asserted"), ("s2", "p", "o2", "asserted"),
      ("o1", "q", "s1", "asserted"), ("o2", "q", "s2", "inferred")))
  }

  test("inverse enrichment closes a partially-mirrored symmetric predicate") {
    import spark.implicits._
    // diagonal (m, m): 2 of 3 facts mirror → jaccard 0.5; the third
    // gains its mirror as inferred. Below threshold nothing is added.
    val tr = Seq(("a", "m", "b"), ("b", "m", "a"), ("c", "m", "d"))
      .toDF("subj", "pred", "obj")
    val got = kg.Ontology.enrichInverses(tr, 0.4)
    assert(got.filter(col("provenance") === "inferred").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
      == Set(("d", "m", "c")))
    assert(kg.Ontology.enrichInverses(tr, 0.6).count() == 3L)
  }

  test("usage type-votes assign the majority type with exact micro scores") {
    import spark.implicits._
    // p1 is used only by T1 entities; p2 splits 1:1 between T1 and T2.
    // u1 uses both → T1 scores 1e6 + 5e5; u2 uses only the ambiguous p2
    // → exact tie, broken to the lexicographically smallest type.
    val typed = Seq(("e1", "T1"), ("e2", "T1"), ("e3", "T2"))
      .toDF("entity_id", "category")
    val tr = Seq(
      ("e1", "p1", "x"), ("e2", "p2", "x"), ("e3", "p2", "x"),
      ("u1", "p1", "x"), ("u1", "p2", "y"), ("u2", "p2", "x"))
      .toDF("subj", "pred", "obj")
    val got = kg.Ontology.inferTypesByUsage(tr, typed).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))).toMap
    assert(got == Map(
      "u1" -> (("T1", 2L, 1500000L, 0.75)),
      "u2" -> (("T1", 1L, 500000L, 0.5))))
  }

  test("usage type-votes ignore predicates without typed evidence") {
    import spark.implicits._
    val typed = Seq(("e1", "T1")).toDF("entity_id", "category")
    val tr = Seq(("e1", "p1", "x"), ("u1", "p1", "x"), ("u1", "pz", "y"),
      ("u2", "pz", "y")).toDF("subj", "pred", "obj")
    val got = kg.Ontology.inferTypesByUsage(tr, typed).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    // u1's pz carries no vote → n_preds = 1, confidence stays 1.0;
    // u2 uses ONLY unvoted predicates → absent entirely
    assert(got.toSeq == Seq(("u1", "T1", 1L, 1000000L, 1.0)))
  }

  test("completeness profile counts per-type predicate coverage") {
    import spark.implicits._
    val types = Seq(("e1", "T"), ("e2", "T"), ("e1", "Thing"),
      ("e2", "Thing")).toDF("entity_id", "type")
    val tr = Seq(("e1", "p", "x"), ("e1", "p", "x2"), ("e1", "q", "x"),
      ("e2", "p", "y"), ("zz", "p", "y")).toDF("subj", "pred", "obj")
    val got = kg.Ontology.completenessProfile(tr, types).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    // multiplicity of e1's p facts collapses; the untyped subject zz is
    // invisible; coverage = entities-with-pred / typed subjects
    assert(got == Set(
      ("T", "p", 2L, 2L, 1.0), ("T", "q", 2L, 1L, 0.5),
      ("Thing", "p", 2L, 2L, 1.0), ("Thing", "q", 2L, 1L, 0.5)))
  }

  test("inverse detection counts distinct facts, not re-assertions") {
    import spark.implicits._
    val tr = Seq(("s1", "p", "o1"), ("s1", "p", "o1"), ("o1", "q", "s1"))
      .toDF("subj", "pred", "obj")
    val row = kg.Ontology.inversePairs(tr)
      .filter(col("pred_a") === "p").head()
    assert((row.getLong(2), row.getLong(3), row.getLong(4),
      row.getDouble(5)) == ((1L, 1L, 1L, 1.0)))
  }

  test("path-rule mining scores support, std/PCA confidence, head coverage") {
    import spark.implicits._
    // p: a→b, b→c, b→d, a→c (a→b duplicated — must not double count);
    // q: a→b, e→b. Rule (q,p ⇒ p) reaches {(a,c),(a,d),(e,c),(e,d)} but
    // e asserts NO p fact, so PCA drops e's pairs from the denominator:
    // std confidence 0.25, PCA confidence 0.5 — the incomplete-KB gap
    val tr = Seq(("a", "p", "b"), ("a", "p", "b"), ("b", "p", "c"),
      ("b", "p", "d"), ("a", "p", "c"), ("a", "q", "b"), ("e", "q", "b"))
      .toDF("subj", "pred", "obj")
    val got = kg.Rules.minePathRules(tr, 1L, 0.2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6),
          r.getLong(7), r.getDouble(8), r.getDouble(9)))).toMap
    assert(got == Map(
      ("p", "p", "p") -> ((2L, 4L, 1L, 0.5, 2L, 0.5, 0.25)),
      ("q", "p", "p") -> ((4L, 4L, 1L, 0.25, 2L, 0.5, 0.25))))
    // both floors prune: raise confidence past 0.5, then support past 1
    assert(kg.Rules.minePathRules(tr, 1L, 0.6).count() == 0L)
    assert(kg.Rules.minePathRules(tr, 2L, 0.2).count() == 0L)
  }

  test("a perfectly transitive predicate mines at confidence 1.0") {
    import spark.implicits._
    val tr = Seq(("a", "p", "b"), ("b", "p", "c"), ("a", "p", "c"))
      .toDF("subj", "pred", "obj")
    val row = kg.Rules.minePathRules(tr, 1L, 0.9).head()
    assert((row.getString(0), row.getString(1), row.getString(2),
      row.getLong(3), row.getLong(4), row.getLong(5), row.getDouble(6),
      row.getLong(7), row.getDouble(8), row.getDouble(9))
      == (("p", "p", "p", 1L, 3L, 1L, 1.0, 1L, 1.0, 0.3333)))
  }

  test("rule application materializes missing heads with provenance") {
    import spark.implicits._
    // p is transitive by rule; (a,c) is entailed-but-missing, (b,d) is
    // entailed AND asserted — it must stay 'asserted', not duplicate
    val tr = Seq(("a", "p", "b"), ("b", "p", "c"), ("c", "p", "d"),
      ("b", "p", "d")).toDF("subj", "pred", "obj")
    val rules = Seq(("p", "p", "p", 0.9)).toDF(
      "body_p", "body_q", "head_r", "confidence") // extra column ignored
    val got = kg.Rules.applyRules(tr, rules).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3))).toSet
    assert(got == Set(
      ("a", "p", "b", "asserted"), ("b", "p", "c", "asserted"),
      ("c", "p", "d", "asserted"), ("b", "p", "d", "asserted"),
      ("a", "p", "c", "inferred"), ("b", "p", "d", "asserted"),
      ("a", "p", "d", "inferred")))
  }

  test("rule application with no matching rule returns asserted facts only") {
    import spark.implicits._
    val tr = Seq(("a", "p", "b"), ("b", "p", "c")).toDF("subj", "pred", "obj")
    val rules = Seq(("q", "q", "q")).toDF("body_p", "body_q", "head_r")
    val got = kg.Rules.applyRules(tr, rules)
    assert(got.count() == 2L)
    assert(got.filter(col("provenance") === "inferred").count() == 0L)
  }

  test("majority vote picks the best-supported object per item") {
    import spark.implicits._
    val facts = Seq(
      // s1: 2 votes for oA, 1 for oB → oA wins, not unanimous
      ("s1", "p", "oA", 0), ("s1", "p", "oA", 1), ("s1", "p", "oB", 2),
      // s2: unanimous across 3 sources
      ("s2", "p", "oC", 0), ("s2", "p", "oC", 1), ("s2", "p", "oC", 2))
      .toDF("subj", "pred", "obj", "source")
    val got = kg.Fusion.majorityVote(facts).collect()
      .map(r => r.getString(0) ->
        ((r.getString(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(got == Map(
      "s1" -> (("oA", 2L, 3L, false)),
      "s2" -> (("oC", 3L, 3L, true))))
  }

  test("vote ties break to the smallest object, deterministically") {
    import spark.implicits._
    val facts = Seq(("s1", "p", "oB", 0), ("s1", "p", "oA", 1))
      .toDF("subj", "pred", "obj", "source")
    val row = kg.Fusion.majorityVote(facts).head()
    assert((row.getString(2), row.getLong(3), row.getLong(4),
      row.getBoolean(5)) == (("oA", 1L, 2L, false)))
  }

  test("a chatty source re-asserting the same claim gets one vote") {
    import spark.implicits._
    val facts = Seq(
      ("s1", "p", "oA", 0), ("s1", "p", "oA", 0), ("s1", "p", "oA", 0),
      ("s1", "p", "oB", 1), ("s1", "p", "oB", 2))
      .toDF("subj", "pred", "obj", "source")
    val row = kg.Fusion.majorityVote(facts).head()
    // source 0's three re-assertions collapse to ONE vote; oB's two
    // distinct sources outvote it
    assert((row.getString(2), row.getLong(3), row.getLong(4),
      row.getBoolean(5)) == (("oB", 2L, 3L, false)))
  }

  test("capture-recapture recovers the universe size exactly on full cycles") {
    import spark.implicits._
    // universe of 12 facts; capture A keeps i%3!=0 (8 facts), capture B
    // keeps i%4!=0 (9 facts) — over the full lcm cycle the captures are
    // exactly independent, so Petersen must recover N = 12 exactly
    def facts(keep: Int => Boolean) = (1 to 12).filter(keep)
      .map(i => (s"s$i", "p", s"o$i")).toDF("subj", "pred", "obj")
    val r = kg.Ontology.captureRecapture(
      facts(_ % 3 != 0), facts(_ % 4 != 0)).head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((8L, 9L, 6L)))
    assert(r.getDouble(4) == 12.0) // Petersen: 8*9/6
    assert(r.getDouble(5) == 11.8571) // Chapman: 9*10/7 - 1
    assert(r.getDouble(6) == 0.6747) // recall_a = 8/11.857...
    assert(r.getDouble(7) == 0.759) // recall_b = 9/11.857...
  }

  test("capture-recapture nulls Petersen on empty overlap, Chapman survives") {
    import spark.implicits._
    // disjoint captures of the same predicate — the worst-recall case —
    // still report: n_both = 0, Petersen NULL, Chapman (2*2/1)-1 = 3
    val a = Seq(("s1", "p", "o1")).toDF("subj", "pred", "obj")
    val b = Seq(("s2", "p", "o2")).toDF("subj", "pred", "obj")
    val r0 = kg.Ontology.captureRecapture(a, b).head()
    assert((r0.getLong(3), r0.isNullAt(4), r0.getDouble(5), r0.getDouble(6))
      == ((0L, true, 3.0, 0.3333)))
    // a one-fact overlap reports the Petersen estimate again
    val b2 = Seq(("s1", "p", "o1"), ("s3", "p", "o3")).toDF("subj", "pred", "obj")
    val r = kg.Ontology.captureRecapture(a, b2).head()
    assert((r.getLong(3), r.getDouble(4), r.getDouble(5)) == ((1L, 2.0, 2.0)))
  }

  test("merge rewrites aligned predicates and keeps novel B vocabulary") {
    import spark.implicits._
    // p↔q align (2 shared of 3/3); B's "s" never co-occurs → keeps its name
    val a = Seq(("s1", "p", "o1"), ("s2", "p", "o2"), ("s3", "p", "o3"))
      .toDF("subj", "pred", "obj")
    val b = Seq(("s1", "q", "o1"), ("s2", "q", "o2"), ("s4", "q", "o4"),
      ("s8", "s", "o8")).toDF("subj", "pred", "obj")
    val got = kg.Ontology.mergeAligned(a, b, 0.2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getBoolean(3), r.getBoolean(4)))).toMap
    assert(got == Map(
      ("s1", "p", "o1") -> ((true, true)), // shared fact, one merged row
      ("s2", "p", "o2") -> ((true, true)),
      ("s3", "p", "o3") -> ((true, false)), // A-only
      ("s4", "p", "o4") -> ((false, true)), // B-only, rewritten q→p
      ("s8", "s", "o8") -> ((false, true)))) // novel B predicate survives
  }

  test("merge threshold: a sub-threshold alignment is NOT rewritten") {
    import spark.implicits._
    // overlap 1 of 3/3 → jaccard 0.2 exactly; threshold 0.5 rejects it
    val a = Seq(("s1", "p", "o1"), ("s2", "p", "o2"), ("s3", "p", "o3"))
      .toDF("subj", "pred", "obj")
    val b = Seq(("s1", "q", "o1"), ("s4", "q", "o4"), ("s5", "q", "o5"))
      .toDF("subj", "pred", "obj")
    val preds = kg.Ontology.mergeAligned(a, b, 0.5)
      .select("pred").distinct().collect().map(_.getString(0)).toSet
    assert(preds == Set("p", "q")) // q kept its name — no rename applied
  }

  test("log-odds weights: coin-flip 0, reliable positive, adversarial negative") {
    import spark.implicits._
    val gold = (1 to 4).map(i => (s"i$i", "p", "T")).toDF("subj", "pred", "obj")
    val claims = ((1 to 4).flatMap { i =>
      Seq((s"i$i", "p", if (i <= 2) "F" else "T", "flip"), // right on 2 of 4
        (s"i$i", "p", "T", "good"), // right on 4 of 4
        (s"i$i", "p", "F", "bad")) // right on 0 of 4
    }).toDF("subj", "pred", "obj", "source")
    val w = kg.Fusion.sourceWeightsMicro(claims, gold)
    // smoothed accuracies 3/6, 5/6, 1/6 → ln(1)=0, ln(5), ln(1/5)
    assert(w == Map("flip" -> 0L, "good" -> 1609438L, "bad" -> -1609438L))
  }

  test("weighted vote lets one reliable source outvote a correlated pair") {
    import spark.implicits._
    // sources a+b are a correlated coin-flip pair (wrong the SAME way on
    // i1, i2); source c is always right; calibrate on all four items
    val gold = (1 to 4).map(i => (s"i$i", "p", "T")).toDF("subj", "pred", "obj")
    val claims = ((1 to 4).flatMap { i =>
      val pairObj = if (i <= 2) "F" else "T"
      Seq((s"i$i", "p", pairObj, "a"), (s"i$i", "p", pairObj, "b"),
        (s"i$i", "p", "T", "c"))
    }).toDF("subj", "pred", "obj", "source")
    val w = kg.Fusion.sourceWeightsMicro(claims, gold)
    val got = kg.Fusion.weightedVote(claims, w).collect()
      .map(r => r.getString(0) ->
        ((r.getString(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    // i1/i2: majority (2 votes) says F, but the pair's combined weight is
    // 0 vs c's ln(5) — the weighted winner FLIPS to the truth
    assert(got("i1") == (("T", 1L, 1609438L, true)))
    assert(got("i2") == (("T", 1L, 1609438L, true)))
    // i3/i4: unanimous, no flip, all three weights sum
    assert(got("i3") == (("T", 3L, 1609438L, false)))
  }

  test("a source absent from the calibration map votes with weight zero") {
    import spark.implicits._
    val claims = Seq(("i1", "p", "A", "unknown"), ("i1", "p", "B", "known"))
      .toDF("subj", "pred", "obj", "source")
    val row = kg.Fusion.weightedVote(claims, Map("known" -> 5L)).head()
    // A would win the unweighted obj-asc tie; weight 5 flips it to B
    assert((row.getString(2), row.getLong(4), row.getBoolean(5))
      == (("B", 5L, true)))
  }

  test("measured hub cap is the p75 degree percentile, floored at 2") {
    // path 1-2-3-4: degrees {1,2,2,1}; exact p75 over [1,1,2,2] = 2
    assert(LinkPredict.measuredHubCap(
      edges(1L -> 2L, 2L -> 3L, 3L -> 4L)) == 2L)
    // single edge: degrees {1,1} → percentile 1 → floored to 2
    assert(LinkPredict.measuredHubCap(edges(1L -> 2L)) == 2L)
  }

  test("evalRanking: exact integer metrics over a deterministic holdout") {
    import graft.core.Buckets
    // K6: dense enough that every held-out pair keeps ≥ 3 common
    // neighbors in the train graph, so each should be rankable
    val all = for (u <- 1L to 6L; v <- (u + 1) to 6L) yield u -> v
    val e = edges(all: _*)
    val row = LinkPredict.evalRanking(e, 5, 2, 100L, 1L).head()
    val (nHold, nRanked, mrr) =
      (row.getLong(0), row.getLong(1), row.getLong(2))
    val (h1, h3, h10) = (row.getLong(3), row.getLong(4), row.getLong(5))
    // the holdout is EXACTLY the shared md5-bucket split
    val expectHold = e.filter(Buckets.md5Bucket(
      concat(col("u").cast("string"), lit(":"), col("v").cast("string")), 5)
      === 2).count()
    assert(nHold == expectHold && nHold > 0L && nHold < all.size)
    // metric sanity: hits monotone, ranks bounded, MRR micro-sum bounded
    // by a rank-1 hit per ranked edge
    assert(h1 <= h3 && h3 <= h10 && h10 <= nRanked && nRanked <= nHold)
    assert(mrr <= 1000000L * nRanked && (mrr > 0L) == (nRanked > 0L))
    // in K6 minus a ≤ 40% holdout every held pair keeps a common
    // neighbor, so all of them rank
    assert(nRanked == nHold)
    // determinism: the replay is byte-identical
    assert(LinkPredict.evalRanking(e, 5, 2, 100L, 1L).head().toSeq
      == row.toSeq)
    intercept[IllegalArgumentException] {
      LinkPredict.evalRanking(e, 5, 5, 100L, 1L)
    }
  }

  private def directed(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("src", "dst")
  }

  test("SCC: cycles, bridge node between cycles, DAG fringe, self-loop") {
    import graft.kg.Scc
    // cycle {1,2,3}; bridge 1→7→4 (7 has in AND out but sits on no
    // cycle — survives trimming, must resolve via carve+peel);
    // cycle {4,5}; tail 5→8; isolated self-loop 9→9.
    // BOTH paths — the distributed carve (localCutoff = 0) and the
    // default trim→Tarjan cutover — must produce the identical labeling
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      7L -> 7L, 4L -> 4L, 5L -> 4L, 8L -> 8L, 9L -> 9L)
    for (cutoff <- Seq(0L, 2000000L)) {
      val got = Scc.run(spark, directed(
        1L -> 2L, 2L -> 3L, 3L -> 1L,
        1L -> 7L, 7L -> 4L,
        4L -> 5L, 5L -> 4L,
        5L -> 8L, 9L -> 9L), localCutoff = cutoff)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == expected, s"localCutoff=$cutoff")
    }
    // pure DAG: every node is its own singleton SCC (all via trimming —
    // the residue is empty, so the cutover contributes nothing)
    val dag = Scc.run(spark, directed(1L -> 2L, 1L -> 3L, 2L -> 4L, 3L -> 4L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(dag == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
    // the round budget is a hard audit, not a silent truncation
    // (distributed path — the cutover would solve this instantly)
    intercept[IllegalArgumentException] {
      Scc.run(spark, directed(1L -> 2L, 2L -> 1L),
        maxRounds = 1, localCutoff = 0L)
    }
  }

  test("Zipf head: rank order, tie-break, and the closed-form slope") {
    import graft.quality.Zipf
    import spark.implicits._
    val docs = Seq((0L, "a a b a c"), (1L, "a b  ")).toDF("doc_id", "text")
    // freqs: a=4, b=2, c=1 → ranks 1,2,3 (no ties here); slope is the
    // least-squares fit over (ln r, ln f), computed closed-form below
    val rows = Zipf.rankFrequency(spark, docs, 100).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq((1L, "a", 4L), (2L, "b", 2L), (3L, "c", 1L)))
    val pts = Seq((1.0, 4.0), (2.0, 2.0), (3.0, 1.0))
      .map { case (r, f) => (math.log(r), math.log(f)) }
    val (mx, my) = (pts.map(_._1).sum / 3, pts.map(_._2).sum / 3)
    val slope = pts.map(p => (p._1 - mx) * (p._2 - my)).sum /
      pts.map(p => (p._1 - mx) * (p._1 - mx)).sum
    val rounded = BigDecimal(slope).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    assert(rows.forall(t => BigDecimal(t._4) == rounded))
    // rank ties break on the token codepoint order
    val tied = Zipf.rankFrequency(spark,
      Seq((0L, "z q z q")).toDF("doc_id", "text"), 100)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(tied == Seq((1L, "q"), (2L, "z")))
  }

  test("TextRank: adjacency edges only, self-pairs and singletons out") {
    import graft.quality.TextRank
    import spark.implicits._
    // "a b a": one undirected edge a—b; "c c": self-pair dropped;
    // "x": no pair at all — c and x never reach the graph
    val docs = Seq((0L, "a b a"), (1L, "c c"), (2L, "x"))
      .toDF("doc_id", "text")
    val got = TextRank.run(spark, docs, 5).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // symmetric 2-node graph: rank stays exactly 0.15 + 0.85·1 = 1.0
    assert(got == Map("a" -> 1.0, "b" -> 1.0))
  }

  test("SCD2: runs collapse, reverted value reopens, current flag") {
    import graft.kg.Scd2
    import spark.implicits._
    import java.sql.Date
    val d = (s: String) => Date.valueOf(s)
    val log = Seq(
      (1L, "A", d("2024-01-01"), 10L), (1L, "A", d("2024-02-01"), 11L),
      (1L, "B", d("2024-03-01"), 12L), (1L, "A", d("2024-04-01"), 13L),
      (2L, "P", d("2024-01-15"), 20L))
      .toDF("e", "v", "ts", "k")
    val got = Scd2.history(log, col("e"), col("v"), col("ts"), col("k"))
      .collect().map(r => ((r.getLong(0), r.getLong(2)),
        (r.getString(1), r.getDate(3).toString, r.getDate(4).toString,
          r.getLong(5), r.getBoolean(6)))).toMap
    assert(got((1L, 1L)) == (("A", "2024-01-01", "2024-03-01", 2L, false)))
    assert(got((1L, 2L)) == (("B", "2024-03-01", "2024-04-01", 1L, false)))
    // the revert to A is a NEW run, not a merge with run 1; the open
    // interval carries the 9999-12-31 sentinel, not NULL
    assert(got((1L, 3L)) == (("A", "2024-04-01", "9999-12-31", 1L, true)))
    assert(got((2L, 1L)) == (("P", "2024-01-15", "9999-12-31", 1L, true)))
    assert(got.size == 4)
    // same-timestamp ties order on the tie column: B(k=2) then A(k=3)
    val tie = Scd2.history(Seq(
        (9L, "B", d("2024-05-01"), 2L), (9L, "A", d("2024-05-01"), 3L))
        .toDF("e", "v", "ts", "k"),
        col("e"), col("v"), col("ts"), col("k"))
      .collect().map(r => r.getLong(2) -> r.getString(1)).toMap
    assert(tie == Map(1L -> "B", 2L -> "A"))
  }

  test("KS drift: max CDF gap, smallest-x tie-break, empty side refused") {
    import graft.quality.Drift
    import spark.implicits._
    // left {1,2}, right {2,3}: gaps 0.5 at x=1, 0.5 at x=2, 0 at x=3 —
    // the tie on 0.5 resolves to the smallest x
    val df = Seq((0, 1L), (0, 2L), (1, 2L), (1, 3L)).toDF("s", "x")
    val row = Drift.ks(df, col("s"), col("x")).head()
    assert((row.getLong(0), row.getDouble(1), row.getLong(2), row.getLong(3))
      == ((1L, 0.5, 2L, 2L)))
    intercept[IllegalArgumentException] {
      Drift.ks(Seq((0, 1L)).toDF("s", "x"), col("s"), col("x")).head()
    }
  }

  test("DAG layers: longest path wins; a cycle refuses, not truncates") {
    import graft.kg.Dag
    // diamond with a long arm: 1→2→3→5, 1→4→5 — 5 sits at layer 3 (the
    // LONGEST incoming path), not 2; 6→5 adds a source at layer 0
    val got = Dag.longestPathLayers(spark, directed(
      1L -> 2L, 2L -> 3L, 3L -> 5L, 1L -> 4L, 4L -> 5L, 6L -> 5L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L,
      5L -> 3L, 6L -> 0L))
    intercept[IllegalArgumentException] {
      Dag.longestPathLayers(spark,
        directed(1L -> 2L, 2L -> 3L, 3L -> 1L), maxDepth = 20)
    }
  }

  test("KTruss: clique survives, pendant and star peel, cascade empties") {
    import graft.kg.KTruss
    def run(k: Int, pairs: (Long, Long)*): Set[(Long, Long, Long)] = {
      val canon = graft.kg.Triangles.canonicalEdges(
        edges(pairs: _*), "u", "v")
      KTruss.trussWithRounds(spark, canon, k)._1.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    // two triangles sharing edge (2,3), plus pendant (4,5): the 3-truss
    // keeps both triangles (every edge closes >= 1), peels the pendant
    val bowtie = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    assert(run(3, bowtie: _*) == Set(
      (1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 2L), (2L, 4L, 1L), (3L, 4L, 1L)))
    // the 4-truss cascade: only (2,3) has support 2, but alone it closes
    // nothing — the peel cascades to empty
    assert(run(4, bowtie: _*) == Set.empty)
    // a 4-clique IS a 4-truss: every edge closes exactly 2 triangles
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(run(4, k4: _*).map(_._3) == Set(2L) && run(4, k4: _*).size == 6)
    // a star has no triangles at all: the 3-truss is empty
    assert(run(3, (1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)) == Set.empty)
    intercept[IllegalArgumentException] {
      KTruss.trussWithRounds(spark,
        graft.kg.Triangles.canonicalEdges(edges((1L, 2L)), "u", "v"), 2)
    }
  }

  test("iterativeTruthMicro: winners, tie rule, and max-claim invariant") {
    import spark.implicits._
    val claims = Seq(
      // item1: sources a+b assert x, c asserts y — x must win with 2 backers
      ("i1", "p", "x", "a"), ("i1", "p", "x", "b"), ("i1", "p", "y", "c"),
      // item2: unanimous — its claim rides at the global max every round
      ("i2", "p", "v", "a"), ("i2", "p", "v", "b"), ("i2", "p", "v", "c"),
      // re-assertion by the same source collapses before any vote
      ("i1", "p", "x", "a"))
      .toDF("subj", "pred", "obj", "source")
    val all = kg.Fusion.iterativeTruthMicro(claims, 3).collect()
      .map(r => r.getString(0) -> ((r.getString(2), r.getLong(3), r.getLong(4))))
    assert(all.length == all.map(_._1).distinct.length) // one winner per item
    val rows = all.toMap
    assert(rows("i1")._1 == "x" && rows("i1")._2 == 2L)
    // the unanimous claim is the global max claim: conf_micro stays 1e6
    assert(rows("i2") == (("v", 3L, 1000000L)))
    // a two-way tie on identical backing breaks to the smaller object
    val tied = Seq(("t", "p", "b", "a"), ("t", "p", "a", "b"))
      .toDF("subj", "pred", "obj", "source")
    assert(kg.Fusion.iterativeTruthMicro(tied, 2).head().getString(2) == "a")
    // determinism: identical run, identical micros
    val again = kg.Fusion.iterativeTruthMicro(claims, 3).collect()
      .map(r => (r.getString(0), r.getString(2), r.getLong(4))).toSet
    assert(again == rows.map { case (s, (o, _, c)) => (s, o, c) }.toSet)
  }

  test("Scc condensation: cycles collapse, cross-edges keep multiplicity") {
    import graft.kg.Scc
    // cycle {1,2,3} → component 1; cycle {4,5} → component 4; edges
    // 2→4 and 3→5 both cross 1→4 (multiplicity 2); 5→6 gives 4→6
    val got = Scc.condensation(spark, directed(
      1L -> 2L, 2L -> 3L, 3L -> 1L, 4L -> 5L, 5L -> 4L,
      2L -> 4L, 3L -> 5L, 5L -> 6L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 4L, 2L), (4L, 6L, 1L)))
    // acyclicity: the condensation feeds the DAG layering without a
    // cycle refusal
    val layers = graft.kg.Dag.longestPathLayers(spark,
      Scc.condensation(spark, directed(
        1L -> 2L, 2L -> 3L, 3L -> 1L, 4L -> 5L, 5L -> 4L, 2L -> 4L))
        .select(col("csrc").as("src"), col("cdst").as("dst")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(layers == Map(1L -> 0L, 4L -> 1L))
  }

  test("Landmarks distanceDistribution: chain cumulative micros") {
    import spark.implicits._
    import graft.kg.Landmarks
    // chain 1-2-3-4-5, seeds {1,5}: dists 1,2,3,4 each appear twice
    val canon = graft.kg.Triangles.canonicalEdges(
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("u", "v"), "u", "v")
    val got = Landmarks.distanceDistribution(spark, canon,
      Seq(1L, 5L).toDF("node"), 6)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set(
      (1L, 2L, 2L, 250000L),   // 2/8
      (2L, 2L, 4L, 500000L),   // 4/8
      (3L, 2L, 6L, 750000L),   // 6/8
      (4L, 2L, 8L, 1000000L))) // 8/8 — 90% effective diameter = 4
  }

  test("Landmarks: chain closed forms — ecc, harmonic micros, hop bound") {
    import spark.implicits._
    import graft.kg.Landmarks
    // chain 1-2-3-4-5; disconnected 8-9 is never reached by these seeds
    val canon = graft.kg.Triangles.canonicalEdges(
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (8L, 9L)).toDF("u", "v"),
      "u", "v")
    val seeds = Seq(1L, 5L).toDF("node")
    val ecc = Landmarks.eccentricity(spark, canon, seeds, 6)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(ecc == Map(1L -> ((4L, 5L)), 5L -> ((4L, 5L))))
    // hop horizon caps both the ecc and the reached set
    val capped = Landmarks.eccentricity(spark, canon, seeds, 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(capped == Map(1L -> ((2L, 3L)), 5L -> ((2L, 3L))))
    // harmonic: per-term 1000000 div dist, self (dist 0) excluded
    val h = Landmarks.harmonic(spark, canon, seeds, 6)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(h(3L) == ((2L, 1000000L)))          // 2 + 2 hops
    assert(h(1L) == ((1L, 250000L)))           // only seed 5, 4 hops
    assert(h(2L) == ((2L, 1000000L + 333333L)))// 1 hop + 3 hops
    assert(!h.contains(8L) && !h.contains(9L)) // unreached component
  }

  private def wedges(triples: (Long, Long, Long)*) = {
    import spark.implicits._
    triples.toDF("u", "v", "w")
  }

  test("Sssp nearestSeed: closed forms — tie-break, hop bound, unreached") {
    import spark.implicits._
    import graft.kg.Sssp
    // 1-2(1), 2-3(1), 1-3(5), 3-4(2); seeds {1, 4}: node 3 is dist 2
    // from BOTH seeds (1→2→3 and 4→3) — the tie must break to seed 1
    val g = wedges((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 5L), (3L, 4L, 2L))
    val got = Sssp.nearestSeed(spark, g, Seq(1L, 4L).toDF("node"), 6)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> ((0L, 1L)), 4L -> ((0L, 4L)),
      2L -> ((1L, 1L)), 3L -> ((2L, 1L))))
    // hop bound: chain 1-2-3 with maxHops 1 never reaches 3; and the
    // cheap-but-long path loses to the direct edge under the bound
    val chain = wedges((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 9L))
    val capped = Sssp.nearestSeed(spark, chain, Seq(1L).toDF("node"), 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped == Map(1L -> 0L, 2L -> 1L, 3L -> 9L))
    // disconnected 8-9 stays unreached
    val disc = Sssp.nearestSeed(spark,
      wedges((1L, 2L, 1L), (8L, 9L, 1L)), Seq(1L).toDF("node"), 6)
      .collect().map(_.getLong(0)).toSet
    assert(disc == Set(1L, 2L))
  }

  test("Sssp nearestSeed: differential vs driver-side Dijkstra") {
    import graft.kg.Sssp
    // deterministic pseudo-random graph: 24 nodes, md5-free arithmetic mix
    val tri = (0 until 60).map { i =>
      val a = (i * 37 + 11) % 24; val b = (i * 53 + 7) % 24
      (math.min(a, b).toLong, math.max(a, b).toLong, ((i * 29) % 9 + 1).toLong)
    }.filter(t => t._1 != t._2).distinct
    val seeds = Seq(0L, 7L, 13L)
    // reference: lexicographic-(dist, seed) Dijkstra over the same graph
    val adj = (tri.map(t => (t._1, (t._2, t._3))) ++
      tri.map(t => (t._2, (t._1, t._3)))).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2) }
    val maxHops = 8
    // bounded Bellman-Ford on the driver: exact replay of the semantics
    var best = seeds.map(s => s -> ((0L, s))).toMap
    (1 to maxHops).foreach { _ =>
      val cand = best.toSeq.flatMap { case (n, (d, s)) =>
        adj.getOrElse(n, Nil).map { case (m, w) => m -> ((d + w, s)) } }
      val merged = (best.toSeq ++ cand).groupBy(_._1).map { case (k, vs) =>
        k -> vs.map(_._2).min }
      best = merged
    }
    val got = Sssp.nearestSeed(spark,
      wedges(tri: _*), { import spark.implicits._; seeds.toDF("node") },
      maxHops)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == best)
  }

  test("Mst forest: closed forms — triangle cut, tie order, two components") {
    import graft.kg.Mst
    // triangle 1-2(1) 2-3(2) 1-3(3) + separate component 5-6(4): the
    // heaviest triangle edge is cut, the isolated pair keeps its edge
    val got = Mst.forest(spark,
      wedges((1L, 2L, 1L), (2L, 3L, 2L), (1L, 3L, 3L), (5L, 6L, 4L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 1L), (2L, 3L, 2L), (5L, 6L, 4L)))
    // equal weights: the (w, u, v) total order drops (2,3) — Kruskal
    // under that order adds (1,2) then (1,3) and rejects the cycle edge
    val tie = Mst.forest(spark,
      wedges((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 1L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(tie == Set((1L, 2L, 1L), (1L, 3L, 1L)))
  }

  test("Mst forest: differential vs driver-side Kruskal") {
    import graft.kg.Mst
    val tri = (0 until 70).map { i =>
      val a = (i * 41 + 5) % 20; val b = (i * 59 + 13) % 20
      (math.min(a, b).toLong, math.max(a, b).toLong, ((i * 31) % 7 + 1).toLong)
    }.filter(t => t._1 != t._2).distinct
    // reference: Kruskal with union-find under the same (w, u, v) order
    val parent = scala.collection.mutable.Map((0L until 20L).map(n => n -> n): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    val expect = tri.sortBy(t => (t._3, t._1, t._2)).flatMap { case (u, v, w) =>
      val (ru, rv) = (find(u), find(v))
      if (ru == rv) None else { parent(ru) = rv; Some((u, v, w)) }
    }.toSet
    val got = Mst.forest(spark, wedges(tri: _*))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
  }
}
