package graft

import graft.kg.{Cooccur, KCore, LinkPredict, Negatives}
import graft.quality.Classifier
import graft.sim.TextVec
import graft.text.{InvertedIndex, UrlCanon}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture and fuzz coverage for the round-5 corpus/KG operators:
  * entity PMI, URL canonicalization, inverted index, quality classifier,
  * k-core, link prediction, and KG negative sampling. */
class CorpusOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-corpusops-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("entityPmi matches brute-force PMI on a planted co-mention corpus") {
    import spark.implicits._
    // doc -> entities; (A,B) co-occur twice, (A,C) twice, (B,C) once
    val linked = Seq(
      (1L, "A"), (1L, "B"), (1L, "A"), // dup mention must not double-count
      (2L, "A"), (2L, "B"), (2L, "C"),
      (3L, "C"), (3L, "A"),
      (4L, "B")).toDF("doc_id", "entity_id")
    val n = 4L
    val got = Cooccur.entityPmi(linked, n).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    // marginals: A=3 docs, B=3, C=2
    def pmi(np: Long, c1: Long, c2: Long) =
      BigDecimal(math.log(np.toDouble * n / (c1.toDouble * c2)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(("A", "B")) == ((2L, pmi(2, 3, 3))))
    assert(got(("A", "C")) == ((2L, pmi(2, 3, 2))))
    assert(got(("B", "C")) == ((1L, pmi(1, 3, 2))))
    assert(got.size == 3)
  }

  test("URL canonicalization ladder handles each normalization case") {
    import spark.implicits._
    val cases = Seq(
      // raw -> expected canonical
      ("https://Pages.Example.ORG/a/b", "https://pages.example.org/a/b"),
      ("HTTPS://EXAMPLE.ORG/X", "https://example.org/X"), // path case kept
      ("https://example.org/a#frag", "https://example.org/a"),
      ("https://www.example.org:443/a", "https://example.org/a"),
      ("http://www.example.org:80/a", "http://example.org/a"),
      ("http://example.org:8080/a", "http://example.org:8080/a"), // non-default kept
      ("https://example.org/a/", "https://example.org/a"),
      ("https://example.org/", "https://example.org"),
      ("https://example.org/a?utm_source=x", "https://example.org/a"),
      ("https://example.org/a?utm_a=1&b=2", "https://example.org/a?b=2"),
      ("https://example.org/a?b=2&utm_a=1", "https://example.org/a?b=2"),
      ("https://example.org/a?utm_a=1&utm_b=2", "https://example.org/a"),
      ("https://example.org/a?b=2&utm_a=1&c=3", "https://example.org/a?b=2&c=3"),
      // 'utm_' as a VALUE or non-prefix substring must survive untouched
      ("https://example.org/a?b=utm_x&c=2", "https://example.org/a?b=utm_x&c=2"),
      ("https://example.org/a?xutm_a=1&b=2", "https://example.org/a?xutm_a=1&b=2"),
      // consecutive utm params followed by a kept one
      ("https://example.org/a?utm_a=1&utm_b=2&c=3", "https://example.org/a?c=3"))
    val got = cases.map(_._1).toDF("url")
      .select(UrlCanon.canonicalize(col("url")).as("c"))
      .collect().map(_.getString(0))
    cases.zip(got).foreach { case ((raw, want), have) =>
      assert(have == want, s"canonicalize($raw)")
    }
  }

  test("rare-token postings exclude heavy tokens and sort doc_ids") {
    import spark.implicits._
    val docs = Seq(
      (10L, "common rare1 x"),
      (7L, "common rare1 y"),
      (3L, "common z"),
      (5L, "common w")).toDF("doc_id", "text")
    val got = InvertedIndex.rareTokenPostings(docs, 2L).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(!got.contains("common")) // df=4 > 2
    assert(got("rare1") == ((2L, "7,10"))) // ascending doc_id, not insertion
    assert(got("x") == ((1L, "10")))
    assert(got("z") == ((1L, "3")))
    // distinct dfs here are {1, 2, 4}: 1st smallest = 1, 2nd = 2, and the
    // rank is clamped to the max when fewer distinct values exist
    assert(InvertedIndex.rareDfCeiling(docs, 1) == 1L)
    assert(InvertedIndex.rareDfCeiling(docs, 2) == 2L)
    assert(InvertedIndex.rareDfCeiling(docs, 99) == 4L)
  }

  test("classifier score equals driver-side dot product + sigmoid") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta beta gamma"), (2L, ""), (3L, "delta"))
      .toDF("doc_id", "text")
    val got = Classifier.score(spark, docs, 64).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    docs.collect().foreach { r =>
      val (id, text) = (r.getLong(0), r.getString(1))
      val raw = TextVec.vectorOf(text, 64).zipWithIndex
        .map { case (v, j) => v * ((j % 7 - 3).toDouble / 3.0) }.sum
      val quality = math.floor(1.0 / (1.0 + math.exp(-raw)) * 1e4 + 0.5) / 1e4
      assert(got(id) == ((quality, raw >= 0)), s"doc $id")
    }
  }

  test("k-core matches a reference peel on seeded random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    (1 to 3).foreach { _ =>
      val n = 20 + rnd.nextInt(20)
      val edges = Seq.fill(n * 3)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      val k = 3
      // reference peel
      var cur = edges
      var changed = true
      while (changed) {
        val deg = cur.flatMap { case (a, b) => Seq(a, b) }
          .groupBy(identity).map { case (x, xs) => x -> xs.size }
        val keep = deg.filter(_._2 >= k).keySet
        val next = cur.filter { case (a, b) => keep(a) && keep(b) }
        changed = next.size != cur.size
        cur = next
      }
      val wantDeg = cur.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).map { case (x, xs) => x -> xs.size.toLong }
      val (coreDf, rounds) = KCore.coreWithRounds(spark,
        edges.toDF("u", "v"), k)
      val got = coreDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == wantDeg)
      assert(rounds >= 1)
    }
  }

  test("k-core peels a pendant chain into the clique (planted)") {
    import spark.implicits._
    // K5 on 0-4 plus a chain 4-10-11-12: k=4 keeps exactly the clique
    val clique = for (a <- 0L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val chain = Seq((4L, 10L), (10L, 11L), (11L, 12L))
    val (core, _) = KCore.coreWithRounds(spark,
      (clique ++ chain).toDF("u", "v"), 4)
    val got = core.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 4L).map(_ -> 4L).toMap)
  }

  test("link prediction scores a 4-cycle's diagonals exactly") {
    import spark.implicits._
    // cycle 1-2-3-4-1: the two absent diagonals (1,3) and (2,4) each share
    // BOTH their neighbors; every degree is 2
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("u", "v")
    val got = LinkPredict.candidates(edges, maxHubDegree = 10L, minCommon = 2L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    val aa = BigDecimal(2.0 / math.log(2.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.size == 2)
    // jaccard = 2 / (2 + 2 - 2) = 1.0
    assert(got((1L, 3L)) == ((2L, 1.0, aa)))
    assert(got((2L, 4L)) == ((2L, 1.0, aa)))
  }

  test("link prediction: hub cap excludes wedge centers, not score degrees") {
    import spark.implicits._
    // star center 0 joined to 1..5, plus edge 1-2: with maxHubDegree=4 the
    // star center (deg 5) is not a wedge center, so the only surviving
    // wedges come from centers 1 and 2 (deg 2 each) — and every pair they
    // generate includes hub 0 or is the existing 1-2 edge, so nothing
    // reaches minCommon=2 except via the hub. Raising the cap to 5 admits
    // the hub and proposes all C(5,2)-1 absent leaf pairs.
    val star = (1L to 5L).map(0L -> _)
    val edges = (star :+ (1L, 2L)).toDF("u", "v")
    // without the hub, the only wedge centers are 1 and 2, and the pairs
    // they emit ((0,2) and (0,1)) are existing edges → empty proposal list
    val capped = LinkPredict.candidates(edges, maxHubDegree = 4L, minCommon = 1L)
      .collect()
    assert(capped.isEmpty)
    val open = LinkPredict.candidates(edges, maxHubDegree = 5L, minCommon = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // all absent leaf pairs (1-2 exists, so 9 of the 10 leaf pairs)
    val want = (for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)).toSet - ((1L, 2L))
    assert(open == want)
    // Jaccard degrees come from the FULL graph even under the cap: leaves
    // 3 and 4 each have degree 1, share neighbor 0 → jaccard = 1/(1+1-1)
    val j34 = LinkPredict.candidates(edges, maxHubDegree = 5L, minCommon = 1L)
      .filter(col("e1") === 3L && col("e2") === 4L)
      .collect().head.getDouble(3)
    assert(j34 == 1.0)
  }

  test("sessionize splits on gap, numbers sessions in time order") {
    import spark.implicits._
    val events = Seq(
      // user 1: gaps 10, 40 with gap limit 15 → sessions {0,10}, {50}
      (1L, 101L, 0L), (1L, 102L, 10L), (1L, 103L, 50L),
      // user 2: singleton
      (2L, 201L, 100L),
      // user 3: tie on sec — one session, still deterministic
      (3L, 302L, 7L), (3L, 301L, 7L))
      .toDF("user_id", "event_id", "sec")
    val got = graft.streaming.Sessionize.sessions(events, 15L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got == Map(
      (1L, 1L) -> ((2L, 0L, 10L, 10L)),
      (1L, 2L) -> ((1L, 50L, 50L, 0L)),
      (2L, 1L) -> ((1L, 100L, 100L, 0L)),
      (3L, 1L) -> ((2L, 7L, 7L, 0L))))
  }

  test("N-Triples roundtrip distinguishes every escape collision") {
    import spark.implicits._
    import graft.sinks.NTriples
    val objs = Seq(
      "plain", "a\nb", "a\\nb", "a\\\nb", "say \"hi\"", "tab\there",
      "cr\rhere", "back\\slash", "\\\\", "", "mixed \\\" \n\t\r end")
    val tr = objs.zipWithIndex
      .map { case (o, i) => (s"e$i", "uses_tool", o) }
      .toDF("subj", "pred", "obj")
    val back = NTriples.parse(NTriples.serialize(tr))
      .orderBy("subj").collect().map(_.getString(2)).toSeq
    val want = objs.zipWithIndex.sortBy { case (_, i) => s"e$i" }.map(_._1)
    assert(back == want)
    // a serialized line never contains a raw newline (splittability)
    NTriples.serialize(tr).collect().foreach { r =>
      assert(!r.getString(0).contains("\n") && !r.getString(0).contains("\r"))
    }
  }

  test("N-Triples serialize rejects IRI-unsafe subjects distributed") {
    import spark.implicits._
    import graft.sinks.NTriples
    val bad = Seq(("has space", "uses_tool", "x")).toDF("subj", "pred", "obj")
    val e = intercept[Exception] {
      NTriples.serialize(bad).collect()
    }
    assert(e.getMessage != null)
    // a non-matching line parses to surfaced empty fields, not a crash
    val parsed = NTriples.parse(Seq("not a triple").toDF("line")).collect()(0)
    assert(parsed.getString(0) == "" && parsed.getString(2) == "")
  }

  test("functional-property audit flags only declared predicates with >1 object") {
    import spark.implicits._
    import graft.kg.Ontology
    val triples = Seq(
      ("e1", "uses_tool", "doc://1"), ("e1", "uses_tool", "doc://2"),
      ("e1", "uses_tool", "doc://2"), // dup object must not count twice
      ("e2", "uses_tool", "doc://3"), // single-valued: clean
      ("e3", "involves", "doc://4"), ("e3", "involves", "doc://5") // undeclared
    ).toDF("subj", "pred", "obj")
    val got = Ontology.functionalViolations(triples, Seq("uses_tool"))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getString(3), r.getString(4)))
    assert(got.toSeq == Seq(("e1", "uses_tool", 2L, "doc://1", "doc://2")))
  }

  test("sorted-neighborhood ER: distributed rank is gap-free and ordered") {
    import spark.implicits._
    val recs = (1L to 97L).map(i => (i, f"k$i%03d")).toDF("rec_id", "key")
      .repartition(7) // force multi-partition ranking
    val got = graft.text.ErMatch.globalRank(recs)
      .orderBy("rnk").collect().map(r => (r.getString(1), r.getLong(2)))
    assert(got.map(_._2).toSeq == (1L to 97L).toSeq) // gap-free 1..n
    assert(got.map(_._1).toSeq == got.map(_._1).sorted.toSeq) // key order
  }

  test("sorted-neighborhood ER matches suffix-dirty twins, bounds window") {
    import spark.implicits._
    val recs = Seq(
      (10L, "alpha"), (11L, "alpha "), // twin within window
      (20L, "gamma"), (21L, "gammaa"), // doubled-char twin
      (30L, "zeta")) // no partner
      .toDF("rec_id", "key")
    val got = graft.text.ErMatch.sortedNeighborhood(recs, 2, 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
    assert(got.contains((10L, 11L, 1)))
    assert(got.contains((20L, 21L, 1)))
    assert(!got.exists { case (a, b, _) => Set(a, b).contains(30L) })
    // id canonicalization: id_a < id_b always
    graft.text.ErMatch.sortedNeighborhood(recs, 4, 3).collect()
      .foreach(r => assert(r.getLong(0) < r.getLong(1)))
  }

  test("negative sampling: deterministic, in-vocabulary, never the true subject") {
    import spark.implicits._
    val triples = Seq(
      ("e1", "uses", "doc://1"), ("e2", "uses", "doc://1"),
      ("e3", "likes", "doc://2"), ("e1", "likes", "doc://3"),
      ("e4", "uses", "doc://4")).toDF("subj", "pred", "obj")
    val a = Negatives.corruptSubject(spark, triples).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getString(3))
      .toMap
    val b = Negatives.corruptSubject(spark, triples).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getString(3))
      .toMap
    assert(a == b) // deterministic
    assert(a.size == 5) // one negative per triple
    val vocab = Set("e1", "e2", "e3", "e4")
    a.foreach { case ((s, _, _), neg) =>
      assert(vocab(neg) && neg != s, s"neg $neg for subj $s")
    }
  }

  test("subclassClosure: chain + diamond close exactly; cycles rejected") {
    import graft.kg.Ontology
    // diamond: D ⊑ B, D ⊑ C, B ⊑ A, C ⊑ A; chain below: E ⊑ D
    val sub = Seq("D" -> "B", "D" -> "C", "B" -> "A", "C" -> "A", "E" -> "D")
    val cl = Ontology.subclassClosure(sub).toSet
    val want = sub.toSet ++ Set("D" -> "A", "E" -> "B", "E" -> "C", "E" -> "A")
    assert(cl == want)
    intercept[IllegalArgumentException] {
      Ontology.subclassClosure(Seq("A" -> "B", "B" -> "A"))
    }
  }

  test("inferTypes: instances carry direct class plus all supertypes only") {
    import spark.implicits._
    import graft.kg.Ontology
    val inst = Seq(("e1", "TOOL"), ("e2", "ACTOR")).toDF("entity_id", "category")
    val sub = Seq("TOOL" -> "Artifact", "ACTOR" -> "Agent",
      "Artifact" -> "Thing", "Agent" -> "Thing")
    val got = Ontology.inferTypes(spark, inst, sub).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("e1", "TOOL"), ("e1", "Artifact"), ("e1", "Thing"),
      ("e2", "ACTOR"), ("e2", "Agent"), ("e2", "Thing")))
  }

  test("starOnObject pairs only the two requested predicates per object") {
    import spark.implicits._
    import graft.kg.TriplePatterns
    val tr = Seq(
      ("t1", "uses_tool", "doc://1"), ("t2", "uses_tool", "doc://1"),
      ("d1", "consumes", "doc://1"), ("d2", "consumes", "doc://2"),
      ("t3", "uses_tool", "doc://2"), ("x1", "performs", "doc://1"))
      .toDF("subj", "pred", "obj")
    val got = TriplePatterns.starOnObject(tr, "uses_tool", "consumes")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(("doc://1", "t1", "d1"), ("doc://1", "t2", "d1"),
      ("doc://2", "t3", "d2")))
  }

  test("chain composes predA/predB through the shared mid with path counts") {
    import spark.implicits._
    import graft.kg.TriplePatterns
    val tr = Seq(
      ("e1", "performs", "doc://1"), ("e2", "performs", "doc://1"),
      ("e1", "performs", "doc://2"),
      ("doc://1", "from_source", "web"), ("doc://2", "from_source", "web"),
      ("doc://1", "in_lang", "en")) // wrong predicate — must not leak in
      .toDF("subj", "pred", "obj")
    val got = TriplePatterns.chain(tr, "performs", "from_source")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("e1", "web", 2L), ("e2", "web", 1L)))
  }

  test("alias mining scores entity co-occurrence with support and confidence") {
    import spark.implicits._
    import graft.kg.Kg
    // "Vector" appears on docs 1,2,3 (with case/space noise and a same-doc
    // re-mention that must collapse); e1 links on docs 1,2 → conf 2/3;
    // e2 links on doc 3 only → support 1, cut by minSupport = 2
    val unl = Seq((1L, "Vector"), (1L, "Vector"), (2L, "vector "),
      (3L, "vector")).toDF("doc_id", "surface")
    val lnk = Seq((1L, "e1"), (2L, "e1"), (3L, "e2"), (3L, "e2"))
      .toDF("doc_id", "entity_id")
    val got = Kg.mineAliases(unl, lnk, minSupport = 2L, minConf = 0.5)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(got == Set(("vector", "e1", 2L, 3L, 0.6667)))
  }

  test("alias mining's confidence floor cuts weak co-occurrence") {
    import spark.implicits._
    import graft.kg.Kg
    // e3 co-occurs on 2 of 4 pages (conf 0.5): survives 0.5, cut at 0.6
    val unl = (1L to 4L).map(d => (d, "beta")).toDF("doc_id", "surface")
    val lnk = Seq((1L, "e3"), (2L, "e3")).toDF("doc_id", "entity_id")
    assert(Kg.mineAliases(unl, lnk, 2L, 0.5).count() == 1L)
    assert(Kg.mineAliases(unl, lnk, 2L, 0.6).count() == 0L)
  }

  test("bgp compiles a chain+star pattern and agrees with the hand-built ops") {
    import spark.implicits._
    import graft.kg.TriplePatterns
    val tr = Seq(
      ("e1", "performs", "doc://1"), ("e2", "performs", "doc://2"),
      ("d1", "consumes", "doc://1"), ("d2", "consumes", "doc://1"),
      ("doc://1", "from_source", "web"), ("doc://2", "from_source", "cc"))
      .toDF("subj", "pred", "obj")
    val got = TriplePatterns.bgp(tr, Seq(
      ("?e", "performs", "?d"), ("?d", "from_source", "?src"),
      ("?e2", "consumes", "?d")))
    assert(got.columns.toSeq == Seq("e", "d", "src", "e2"))
    assert(got.collect().map(r => (r.getString(0), r.getString(1),
      r.getString(2), r.getString(3))).toSet == Set(
      ("e1", "doc://1", "web", "d1"), ("e1", "doc://1", "web", "d2")))
    // connected BGP must never plan a cartesian product
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("NestedLoop"))
  }

  test("bgp: a repeated variable within one pattern matches self-loops only") {
    import spark.implicits._
    import graft.kg.TriplePatterns
    val tr = Seq(("a", "knows", "a"), ("a", "knows", "b"))
      .toDF("subj", "pred", "obj")
    val got = TriplePatterns.bgp(tr, Seq(("?x", "knows", "?x")))
    assert(got.collect().map(_.getString(0)).toSeq == Seq("a"))
  }

  test("bgp: a constant-only pattern is an EXISTS gate") {
    import spark.implicits._
    import graft.kg.TriplePatterns
    val tr = Seq(("a", "p", "b"), ("c", "q", "d")).toDF("subj", "pred", "obj")
    assert(TriplePatterns.bgp(tr,
      Seq(("?x", "p", "?y"), ("c", "q", "d"))).count() == 1L)
    assert(TriplePatterns.bgp(tr,
      Seq(("?x", "p", "?y"), ("c", "q", "MISSING"))).count() == 0L)
  }

  test("bgp: disconnected pattern groups cross-multiply (SPARQL product)") {
    import spark.implicits._
    import graft.kg.TriplePatterns
    val tr = Seq(("a", "p", "b"), ("a2", "p", "b2"), ("x", "q", "y"))
      .toDF("subj", "pred", "obj")
    val got = TriplePatterns.bgp(tr, Seq(("?s", "p", "?o"), ("?u", "q", "?v")))
    assert(got.count() == 2L)
    assert(got.columns.toSeq == Seq("s", "o", "u", "v"))
  }

  test("bgpWhere applies VALUES and FILTER comparisons to solutions") {
    import spark.implicits._
    import graft.kg.TriplePatterns
    val tr = Seq(
      ("a1", "p", "m"), ("a2", "p", "m"), ("a3", "p", "m"),
      ("b1", "q", "m"), ("zz", "q", "m"))
      .toDF("subj", "pred", "obj")
    // VALUES prunes ?a to {a1, a2}; ?a < ?b keeps var-var order pairs;
    // ?b != zz is the var-const comparison
    val got = TriplePatterns.bgpWhere(tr,
      Seq(("?a", "p", "?m"), ("?b", "q", "?m")),
      Seq(("?a", "<", "?b"), ("?b", "!=", "zz")),
      Map("?a" -> Seq("a1", "a2")))
    assert(got.columns.toSeq == Seq("a", "m", "b"))
    assert(got.collect().map(r => (r.getString(0), r.getString(2))).toSet ==
      Set(("a1", "b1"), ("a2", "b1")))
    // an unbound variable in a filter or VALUES is a caller bug
    intercept[IllegalArgumentException] {
      TriplePatterns.bgpWhere(tr, Seq(("?a", "p", "?m")),
        Seq(("?nope", "=", "x")))
    }
  }

  test("pathSequence composes inverse and alternation legs, set semantics") {
    import spark.implicits._
    import graft.kg.TriplePatterns
    val tr = Seq(
      ("o1", "performs", "d1"), ("t1", "uses_tool", "d1"),
      ("x1", "consumes", "d1"), ("x2", "involves", "d1"),
      ("o2", "performs", "d2"),
      // a duplicate walk: o1 reaches x1 via both its legs' alternatives?
      // no — via d1 only, but t1→d1→x1 and t1→d1→x2 are distinct pairs
      ("o1", "performs", "d3"), ("x1", "consumes", "d3"))
      .toDF("subj", "pred", "obj")
    // (performs|uses_tool) / ^(consumes|involves): o1 reaches x1 through
    // BOTH d1 and d3 yet appears once (set semantics); o2's page grounds
    // no consumer, so o2 vanishes
    val got = TriplePatterns.pathSequence(tr,
      Seq("performs|uses_tool", "^consumes|^involves")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(
      ("o1", "x1"), ("o1", "x2"), ("t1", "x1"), ("t1", "x2")))
  }

  test("bgpExists gates solutions; diverges from MINUS when uncorrelated") {
    import spark.implicits._
    import graft.kg.TriplePatterns
    val tr = Seq(
      ("e1", "p", "d1"), ("e2", "p", "d2"),
      ("a1", "q", "d1"),
      ("z1", "r", "w1")).toDF("subj", "pred", "obj")
    val req = Seq(("?e", "p", "?d"))
    def es(g: Seq[(String, String, String)], neg: Boolean) =
      TriplePatterns.bgpExists(tr, req, g, neg).collect()
        .map(_.getString(0)).toSet
    // shared variable ?d: semi keeps the q-grounded page, anti drops it
    assert(es(Seq(("?x", "q", "?d")), neg = false) == Set("e1"))
    assert(es(Seq(("?x", "q", "?d")), neg = true) == Set("e2"))
    // NO shared variable, group matches: EXISTS keeps ALL, NOT EXISTS
    // removes ALL — while SPARQL MINUS removes NOTHING (§8.3 divergence)
    val disjoint = Seq(("?u", "r", "?v"))
    assert(es(disjoint, neg = false) == Set("e1", "e2"))
    assert(es(disjoint, neg = true) == Set.empty[String])
    assert(TriplePatterns.bgpMinus(tr, req, disjoint).count() == 2L)
    // NO shared variable, group empty: the gates invert
    val empty = Seq(("?u", "missing", "?v"))
    assert(es(empty, neg = false) == Set.empty[String])
    assert(es(empty, neg = true) == Set("e1", "e2"))
  }

  test("bgpOptional keeps unmatched solutions with nulls (SPARQL OPTIONAL)") {
    import spark.implicits._
    import graft.kg.TriplePatterns
    val tr = Seq(
      ("e1", "performs", "doc://1"), ("e2", "performs", "doc://2"),
      ("doc://1", "in_lang", "fr"), ("fr", "lang_name", "French"))
      .toDF("subj", "pred", "obj")
    val got = TriplePatterns.bgpOptional(tr,
      Seq(("?e", "performs", "?d")),
      Seq(Seq(("?d", "in_lang", "?lg")), Seq(("?lg", "lang_name", "?nm"))))
    assert(got.columns.toSeq == Seq("e", "d", "lg", "nm"))
    // the second group chains on the first's variable; e2's null lg
    // cannot match, so nm stays null too
    assert(got.collect().map(r => (r.getString(0), r.getString(1),
      Option(r.getString(2)), Option(r.getString(3)))).toSet == Set(
      ("e1", "doc://1", Some("fr"), Some("French")),
      ("e2", "doc://2", None, None)))
  }

  test("bgpOptional rejects an optional group sharing no variable") {
    import spark.implicits._
    import graft.kg.TriplePatterns
    val tr = Seq(("a", "p", "b")).toDF("subj", "pred", "obj")
    intercept[IllegalArgumentException] {
      TriplePatterns.bgpOptional(tr, Seq(("?x", "p", "?y")),
        Seq(Seq(("?u", "q", "?v"))))
    }
  }

  test("bgpUnion bag-unions branches, null-padding unshared variables") {
    import spark.implicits._
    import graft.kg.TriplePatterns
    val tr = Seq(
      ("e1", "performs", "doc://1"), ("e2", "consumes", "doc://2"),
      ("doc://2", "from_source", "cc"),
      // e3 consumes a page with no source meta → branch 2 drops it
      ("e3", "consumes", "doc://9"))
      .toDF("subj", "pred", "obj")
    val got = TriplePatterns.bgpUnion(tr, Seq(
      Seq(("?e", "performs", "?d")),
      Seq(("?e", "consumes", "?d"), ("?d", "from_source", "?src"))))
    assert(got.columns.toSeq == Seq("e", "d", "src"))
    assert(got.collect().map(r => (r.getString(0), r.getString(1),
      Option(r.getString(2)))).toSet == Set(
      ("e1", "doc://1", None),
      ("e2", "doc://2", Some("cc"))))
    // duplicates across branches survive: bag union, not set union
    val dup = TriplePatterns.bgpUnion(tr, Seq(
      Seq(("?e", "performs", "?d")), Seq(("?e", "performs", "?d"))))
    assert(dup.count() == 2L)
  }

  test("bgpAggregate groups, filters with HAVING, orders and cuts") {
    import spark.implicits._
    import graft.kg.TriplePatterns
    val tr = Seq(
      ("e1", "performs", "d1"), ("e1", "performs", "d2"),
      ("e1", "performs", "d3"),
      ("e2", "performs", "d1"), ("e2", "performs", "d2"),
      ("e3", "performs", "d1"), // HAVING drops the singleton
      ("e4", "performs", "d1"), ("e4", "performs", "d2"))
      .toDF("subj", "pred", "obj")
    val got = TriplePatterns.bgpAggregate(tr,
      Seq(("?e", "performs", "?d")),
      groupBy = Seq("?e"),
      aggs = Seq(("count", "?d", "n"), ("min", "?d", "lo"),
        ("max", "?d", "hi")),
      having = Seq(("n", ">=", 2L)),
      orderBy = Seq("-n", "e"),
      limit = Some(2))
    assert(got.columns.toSeq == Seq("e", "n", "lo", "hi"))
    // e1 (3) leads; e2 beats e4 on the ascending tie-break; LIMIT 2 cuts
    assert(got.collect().map(r => (r.getString(0), r.getLong(1),
      r.getString(2), r.getString(3))).toSeq == Seq(
      ("e1", 3L, "d1", "d3"), ("e2", 2L, "d1", "d2")))
    intercept[IllegalArgumentException] {
      TriplePatterns.bgpAggregate(tr, Seq(("?e", "performs", "?d")),
        Seq("?e"), Seq(("count", "?d", "n")), having = Seq(("bad", ">=", 1L)))
    }
  }

  test("bgpAggregate group_concat is distinct, sorted, byte-stable") {
    import spark.implicits._
    import graft.kg.TriplePatterns
    val tr = Seq(
      ("e1", "p", "d2"), ("e1", "p", "d1"), ("e1", "p", "d3"),
      ("e2", "p", "d9")).toDF("subj", "pred", "obj")
    val got = TriplePatterns.bgpAggregate(tr, Seq(("?e", "p", "?d")),
      groupBy = Seq("?e"),
      aggs = Seq(("group_concat", "?d", "ds"), ("count", "?d", "n")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    // arrival order d2,d1,d3 must not leak: sorted ascending, |-joined
    assert(got == Set(("e1", "d1|d2|d3", 3L), ("e2", "d9", 1L)))
  }

  test("bgpConstruct instantiates templates per solution, set semantics") {
    import spark.implicits._
    import graft.kg.TriplePatterns
    val tr = Seq(
      ("a1", "performs", "d1"), ("a2", "performs", "d1"),
      ("b1", "consumes", "d1"),
      ("a1", "performs", "d2"), ("b1", "consumes", "d2"),
      ("z1", "other", "d3")).toDF("subj", "pred", "obj")
    val got = TriplePatterns.bgpConstruct(tr,
      Seq(("?a", "performs", "?d"), ("?b", "consumes", "?d")),
      Seq(("?a", "processes", "?b"), ("?a", "grounded_in", "?d")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet
    // (a1, processes, b1) arises from BOTH d1 and d2 solutions but the
    // graph is a set — exactly one triple survives
    assert(got == Set(
      ("a1", "processes", "b1"), ("a2", "processes", "b1"),
      ("a1", "grounded_in", "d1"), ("a2", "grounded_in", "d1"),
      ("a1", "grounded_in", "d2")))
    // a template variable the WHERE never binds is a compile error
    intercept[IllegalArgumentException] {
      TriplePatterns.bgpConstruct(tr, Seq(("?a", "performs", "?d")),
        Seq(("?a", "p", "?nope")))
    }
  }

  test("entity summarization ranks rarest (pred, obj) values first") {
    import spark.implicits._
    import graft.kg.Summarize
    // (p,b) is common (3 subjects), (p,c) and (q,b) are unique; s1's
    // duplicate fact must not double-count the frequency
    val tr = Seq(("s1", "p", "b"), ("s2", "p", "b"), ("s3", "p", "b"),
      ("s1", "p", "c"), ("s1", "p", "c"), ("s1", "q", "b"))
      .toDF("subj", "pred", "obj")
    val got = Summarize.topFacts(tr, 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    // s1: rank 1 = (p,c) (n_po 1, pred tiebreak beats (q,b)), rank 2 =
    // (q,b); the common (p,b) is cut by k=2
    assert(got == Set(
      ("s1", "p", "c", 1L, 1L), ("s1", "q", "b", 1L, 2L),
      ("s2", "p", "b", 3L, 1L), ("s3", "p", "b", 3L, 1L)))
  }

  test("bounded path closure returns minimal hop counts, one predicate only") {
    import spark.implicits._
    import graft.kg.TriplePatterns
    // chain a→b→c→d→e plus the shortcut a→c; q-edges must not leak in
    val tr = Seq(("a", "p", "b"), ("b", "p", "c"), ("c", "p", "d"),
      ("d", "p", "e"), ("a", "p", "c"), ("x", "q", "y"))
      .toDF("subj", "pred", "obj")
    val got = TriplePatterns.closure(tr, "p", 3).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("a", "b") -> 1L, ("b", "c") -> 1L, ("c", "d") -> 1L,
      ("d", "e") -> 1L, ("a", "c") -> 1L,
      ("a", "d") -> 2L, ("b", "d") -> 2L, ("c", "e") -> 2L,
      ("a", "e") -> 3L, ("b", "e") -> 3L))
    assert(TriplePatterns.closure(tr, "p", 1).count() == 5L)
  }

  test("firstMentionContexts slices the text between first mentions only") {
    import spark.implicits._
    import graft.kg.RelationMining
    // "alpha loads beta" — alpha also reappears later; only FIRST spans pair
    val docs = Seq((1L, "alpha loads beta then alpha again")).toDF("doc_id", "text")
    val linked = Seq(
      (1L, "eA", 0, 5), (1L, "eA", 22, 27), // two alpha mentions
      (1L, "eB", 12, 16))                   // beta
      .toDF("doc_id", "entity_id", "begin_c", "end_c")
    val got = RelationMining.firstMentionContexts(linked, docs, 40).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    // eA(0,5) -> eB(12,16): between = " loads " -> "loads"
    // eB(12,16) -> second alpha is NOT eA's first mention, so no eB->eA pair
    assert(got == Set(("eA", "eB", "loads", 1L)))
  }

  test("salience: density plus early-position bonus, exact arithmetic") {
    import spark.implicits._
    import graft.kg.RelationMining
    val docs = Seq((1L, "x y x z")).toDF("doc_id", "text") // 4 tokens, 7 chars
    val linked = Seq((1L, "eX", 0, 1), (1L, "eX", 4, 5), (1L, "eZ", 6, 7))
      .toDF("doc_id", "entity_id", "begin_c", "end_c")
    val got = RelationMining.salience(linked, docs).collect()
      .map(r => (r.getString(1), (r.getLong(2), r.getInt(3), r.getDouble(4))))
      .toMap
    assert(got("eX") == ((2L, 0, BigDecimal(2.0 / 4 + 1.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(got("eZ") == ((1L, 6, BigDecimal(1.0 / 4 + (1 - 6.0 / 7))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("temporalScope windows first/last observation per (subj, pred)") {
    import spark.implicits._
    import graft.kg.TriplePatterns
    val tr = Seq(
      ("s1", "p", "o1", 100L), ("s1", "p", "o2", 400L), ("s1", "p", "o3", 250L),
      ("s2", "q", "o4", 50L))
      .toDF("subj", "pred", "obj", "ts_s")
    val got = TriplePatterns.temporalScope(tr).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got(("s1", "p")) == ((3L, 100L, 400L, 300L)))
    assert(got(("s2", "q")) == ((1L, 50L, 50L, 0L)))
  }

  test("random walks: md5 choices replayed by a driver-side simulation") {
    import spark.implicits._
    import graft.kg.RandomWalks
    // triangle 1-2-3 plus a pendant 4 hanging off 3
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("u", "v")
    val got = RandomWalks.walks(spark, edges, 2, 3).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    // brute-force the same deterministic process
    val adj = Map(1L -> Seq(2L, 3L), 2L -> Seq(1L, 3L),
      3L -> Seq(1L, 2L, 4L), 4L -> Seq(3L))
    def h(key: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16)
    }
    val want = (for (node <- adj.keys; r <- 0 to 1) yield {
      val id = node * 2 + r
      var cur = node
      val path = new StringBuilder(cur.toString)
      for (s <- 1 to 3) {
        cur = adj(cur)((h(s"$id|$s") % adj(cur).size).toInt)
        path.append("->").append(cur)
      }
      id -> path.toString
    }).toMap
    assert(got == want)
    // determinism: a second run is byte-identical
    val again = RandomWalks.walks(spark, edges, 2, 3).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(again == got)
  }

  test("contextEmbeddings pools the mean vector per entity, cell-shaped") {
    import spark.implicits._
    import graft.kg.RelationMining
    val linked = Seq((0L, "eA"), (1L, "eA"), (0L, "eA"), (1L, "eB"))
      .toDF("doc_id", "entity_id") // dup mention must not re-weight doc 0
    val emb = Seq((0L, Array(1.0f, 3.0f)), (1L, Array(2.0f, 5.0f)))
      .toDF("vec_id", "embedding")
    val got = RelationMining.contextEmbeddings(linked, emb).collect()
      .map(r => ((r.getString(0), r.getInt(1)), r.getDouble(2))).toMap
    assert(got == Map(("eA", 0) -> 1.5, ("eA", 1) -> 4.0,
      ("eB", 0) -> 2.0, ("eB", 1) -> 5.0))
  }

  test("snapshotDiff labels kept/added/removed exactly") {
    import spark.implicits._
    import graft.kg.TriplePatterns
    val a = Seq(("s1", "p", "o1"), ("s2", "p", "o2")).toDF("subj", "pred", "obj")
    val b = Seq(("s1", "p", "o1"), ("s3", "p", "o3")).toDF("subj", "pred", "obj")
    val got = TriplePatterns.snapshotDiff(a, b).collect()
      .map(r => (r.getString(0), r.getString(3))).toSet
    assert(got == Set(("s1", "kept"), ("s2", "removed"), ("s3", "added")))
  }

  test("bgpMinus removes solutions compatible with the minus group") {
    import spark.implicits._
    import graft.kg.TriplePatterns
    val tr = Seq(
      ("e1", "performs", "doc://1"), ("e2", "performs", "doc://2"),
      ("doc://1", "in_lang", "fr")).toDF("subj", "pred", "obj")
    val got = TriplePatterns.bgpMinus(tr,
      Seq(("?e", "performs", "?d")), Seq(("?d", "in_lang", "?lg")))
    assert(got.columns.toSeq == Seq("e", "d"))
    assert(got.collect().map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("e2", "doc://2")))
  }

  test("bgpMinus with no shared variable removes nothing (SPARQL MINUS)") {
    import spark.implicits._
    import graft.kg.TriplePatterns
    // disjoint domains are never compatible, so even a non-empty minus
    // group removes nothing — per the SPARQL MINUS definition
    val tr = Seq(("a", "p", "b"), ("x", "q", "y")).toDF("subj", "pred", "obj")
    val got = TriplePatterns.bgpMinus(tr,
      Seq(("?s", "p", "?o")), Seq(("?u", "q", "?v")))
    assert(got.collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("a", "b")))
  }

  test("transitiveReduction flags exactly the path-entailed edges") {
    import spark.implicits._
    import graft.kg.TriplePatterns
    // chain a→b→c with 2-hop shortcut a→c; disjoint chain p→q→r→s with
    // 3-hop-ONLY shortcut p→s (no 2-hop path exists); q-pred noise must
    // not leak in
    val tr = Seq(("a", "p", "b"), ("b", "p", "c"), ("a", "p", "c"),
      ("p", "p", "q"), ("q", "p", "r"), ("r", "p", "s"), ("p", "p", "s"),
      ("x", "other", "y")).toDF("subj", "pred", "obj")
    def flags(maxHops: Int) =
      TriplePatterns.transitiveReduction(tr, "p", maxHops).collect()
        .map(r => (r.getString(0), r.getString(2)) -> r.getBoolean(3)).toMap
    val at3 = flags(3)
    assert(at3 == Map(
      ("a", "b") -> false, ("b", "c") -> false, ("a", "c") -> true,
      ("p", "q") -> false, ("q", "r") -> false, ("r", "s") -> false,
      ("p", "s") -> true))
    // hop bound 2: the 3-hop-only bypass p→s stays unflagged — the
    // documented bounded-depth judgment call
    val at2 = flags(2)
    assert(at2(("a", "c")) && !at2(("p", "s")))
  }

  test("transitiveReduction is cycle-safe: no edge is entailed by itself") {
    import spark.implicits._
    import graft.kg.TriplePatterns
    // a 2-cycle, a self-loop, and a genuine shortcut over a cycle edge:
    // walk-based flagging would delete the whole 2-cycle via walks that
    // traverse the audited edge; simple-path semantics flags only g→i
    // (entailed by g→h→i), leaves the cycle and the self-loop intact,
    // and ignores the edge-under-audit walk m→n→m→n
    val tr = Seq(("a", "p", "b"), ("b", "p", "a"), ("u", "p", "u"),
      ("g", "p", "h"), ("h", "p", "i"), ("g", "p", "i"), ("i", "p", "g"),
      ("m", "p", "n"), ("n", "p", "m"), ("n", "p", "z"))
      .toDF("subj", "pred", "obj")
    val got = TriplePatterns.transitiveReduction(tr, "p", 3).collect()
      .map(r => (r.getString(0), r.getString(2)) -> r.getBoolean(3)).toMap
    assert(got == Map(
      ("a", "b") -> false, ("b", "a") -> false, ("u", "u") -> false,
      ("g", "h") -> false, ("h", "i") -> false, ("g", "i") -> true,
      ("i", "g") -> false,
      ("m", "n") -> false, ("n", "m") -> false, ("n", "z") -> false))
  }

  test("shapeViolations checks min/max cardinality, absent facts as zero") {
    import spark.implicits._
    import graft.kg.Ontology
    // shapes: T needs p in [2, 3]; T needs q in [1, 9] (absence check)
    val shapes = Seq(("T", "p", 2L, 3L), ("T", "q", 1L, 9L))
    val types = Seq(("a", "T"), ("b", "T"), ("c", "T"), ("d", "U"))
      .toDF("entity_id", "type")
    // a: p×1 (min), no q (min at 0); b: p×4 (max), q×1 (ok);
    // c: p×2 dup'd (ok — distinct objects), q×1 (ok); d: untyped-shape U
    val tr = Seq(
      ("a", "p", "o1"),
      ("b", "p", "o1"), ("b", "p", "o2"), ("b", "p", "o3"), ("b", "p", "o4"),
      ("b", "q", "x"),
      ("c", "p", "o1"), ("c", "p", "o1"), ("c", "p", "o2"), ("c", "q", "x"),
      ("d", "p", "o1")).toDF("subj", "pred", "obj")
    val got = Ontology.shapeViolations(spark, tr, types, shapes).collect()
      .map(r => (r.getString(0), r.getString(2), r.getLong(3), r.getString(6)))
      .toSet
    assert(got == Set(
      ("a", "p", 1L, "min"), ("a", "q", 0L, "min"), ("b", "p", 4L, "max")))
  }

  test("aliasAmbiguity folds grounding entropy per unresolved surface") {
    import spark.implicits._
    import graft.kg.Kg
    // surface "x": 3 docs ground e1, 1 doc grounds e2 →
    // H = ln(4) - (3·ln3 + 1·ln1)/4 = 0.5623; "y": one entity → H = 0
    val unl = Seq((1L, "X"), (2L, "x "), (3L, "x"), (4L, "x"),
      (1L, "y"), (2L, "y")).toDF("doc_id", "surface")
    val lnk = Seq((1L, "e1"), (2L, "e1"), (3L, "e1"), (4L, "e2"))
      .toDF("doc_id", "entity_id")
    val got = Kg.aliasAmbiguity(unl, lnk).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).sortBy(_._1)
    assert(got.toSeq == Seq(
      ("x", 2L, 4L, 0.75, 0.5623),
      ("y", 1L, 2L, 1.0, 0.0)))
  }

  test("evalBlocking folds the Christen triple in one aggregate") {
    import spark.implicits._
    import graft.text.ErMatch
    val records = (1L to 6L).map(i => (i, s"r$i")).toDF("rec_id", "key")
    val gold = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    // one true pair found, one missed, two false candidates (one dup'd —
    // the distinct guard); C(6,2) = 15 comparisons avoided down to 3
    val cand = Seq((1L, 2L), (1L, 3L), (5L, 6L), (5L, 6L))
      .toDF("id_a", "id_b")
    val r = ErMatch.evalBlocking(cand, gold, records).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((6L, 3L, 2L, 1L)))
    assert((r.getDouble(4), r.getDouble(5), r.getDouble(6)) ==
      ((0.5, 0.3333, 0.8)))
  }

  test("linearize emits byte-pinned per-entity docs with visible caps") {
    import spark.implicits._
    import graft.kg.Summarize
    // s1's p-list truncates at cap 2 (c dropped, ',…' shown) while
    // n_facts still counts all 4 distinct facts; duplicates collapse
    val tr = Seq(
      ("s1", "p", "c"), ("s1", "p", "a"), ("s1", "p", "b"),
      ("s1", "p", "a"), ("s1", "q", "x"),
      ("s2", "p", "a")).toDF("subj", "pred", "obj")
    val got = Summarize.linearize(tr, 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      ("s1", 4L, "p=a,b,…|q=x"),
      ("s2", 1L, "p=a")))
  }

  test("induceShapes profiles the observed (type, pred) envelope exactly") {
    import spark.implicits._
    import graft.kg.Ontology
    val types = Seq(("a", "T"), ("b", "T"), ("c", "U"))
      .toDF("entity_id", "type")
    val tr = Seq(
      ("a", "p", "o1"), ("a", "p", "o2"), ("a", "p", "o2"), // dup collapses
      ("b", "p", "o1"), ("a", "q", "x"),
      ("c", "p", "o5"), ("c", "p", "o6"), ("c", "p", "o7"))
      .toDF("subj", "pred", "obj")
    val got = Ontology.induceShapes(tr, types).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == Set(
      ("T", "p", 2L, 1L, 2L, 1500000L),
      ("T", "q", 1L, 1L, 1L, 1000000L),
      ("U", "p", 1L, 3L, 3L, 3000000L)))
  }

  test("label outliers rank the least-coherent vectors, ties on vec_id") {
    import spark.implicits._
    import graft.sim.LabelCoherence
    // label 0: two aligned vectors + one orthogonal → the orthogonal one
    // is the rank-1 outlier; label 1: parallel vectors tie at cos 1.0 →
    // the smaller vec_id wins the tie
    val emb = Seq(
      (1L, Array(1f, 0f), 0), (2L, Array(1f, 0f), 0), (3L, Array(0f, 1f), 0),
      (10L, Array(0f, 2f), 1), (11L, Array(0f, 1f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = LabelCoherence.outliers(emb, 1).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq((0, 1, 3L, 0.4472), (1, 1, 10L, 1.0)))
  }

  test("schemaGraph collapses instances onto types with an untyped bucket") {
    import spark.implicits._
    import graft.kg.Summarize
    val tr = Seq(
      ("e1", "performs", "doc://1"), ("e1", "performs", "doc://1"), // dup fact
      ("e2", "performs", "doc://2"), ("e3", "uses", "doc://1"))
      .toDF("subj", "pred", "obj")
    val ty = Seq(("e1", "OPERATION"), ("e2", "OPERATION")).toDF("node", "type")
    val got = Summarize.schemaGraph(tr, ty).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // the duplicate e1 fact collapses before counting; e3 and the doc://
    // objects land in the untyped bucket
    assert(got == Map(
      ("OPERATION", "performs", "untyped") -> ((2L, 2L, 2L)),
      ("untyped", "uses", "untyped") -> ((1L, 1L, 1L))))
  }

  test("collapseFacts re-grounds mirror facts on the cluster winner") {
    import spark.implicits._
    import graft.kg.SameAs
    // docs 1,2 are mirrors (winner 1), doc 3 a singleton; entity A on all
    // three pages, B only on the mirror copy
    val linked = Seq(
      (1L, "A", "OPERATION"), (2L, "A", "OPERATION"), (3L, "A", "OPERATION"),
      (2L, "B", "TOOL"))
      .toDF("doc_id", "entity_id", "category")
    val clusters = Seq((1L, 1L, true), (2L, 1L, false), (3L, 3L, true))
      .toDF("doc_id", "cluster_id", "is_winner")
    val got = SameAs.collapseFacts(linked, clusters,
      Map("OPERATION" -> "performs", "TOOL" -> "uses_tool")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getLong(3)).toMap
    // A on pages 1+2 collapses to ONE fact on doc://1 with 2 sources
    assert(got == Map(
      ("A", "performs", "doc://1") -> 2L,
      ("A", "performs", "doc://3") -> 1L,
      ("B", "uses_tool", "doc://1") -> 1L))
  }

  test("measurements extracts and normalizes mixed-format literals") {
    import spark.implicits._
    import graft.text.Literals
    val df = Seq(
      (1L, "walked 12 km then 3,500 m in 250ms; mass 1.5 kg, 3 g, 45 s"))
      .toDF("doc_id", "text")
    val got = Literals.measurements(df, "doc_id", "text").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getString(3),
        r.getString(4), r.getLong(5))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, "12", "km", "m", 12000000000L),
      (1L, "3,500", "m", "m", 3500000000L),
      (2L, "250", "ms", "s", 250000L),
      (3L, "1.5", "kg", "g", 1500000000L),
      (4L, "3", "g", "g", 3000000L),
      (5L, "45", "s", "s", 45000000L)))
  }

  test("measurements leaves comma-grouped decimals fully unrecognized") {
    import spark.implicits._
    import graft.text.Literals
    // the documented judgment call: a comma-grouped DECIMAL must produce
    // NO mention — without the left-context guard the failed match
    // re-anchors mid-number and emits a corrupted "500.25 m" /
    // "042.5 km"; bare-dot decimals stay out for the same reason
    val df = Seq(
      (1L, "ran 3,500.25 m uphill"),
      (2L, "total 1,042.5 km logged"),
      (3L, "about .5 m short"),
      (4L, "exactly 7.25 m and 2,000 m")).toDF("doc_id", "text")
    val got = Literals.measurements(df, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(2), r.getString(3))).sortBy(identity)
    assert(got.toSeq == Seq((4L, "2,000", "m"), (4L, "7.25", "m")))
  }

  test("closureFixpoint reaches the full transitive closure, cycles included") {
    import spark.implicits._
    import graft.kg.TriplePatterns
    // chain a→b→c→d plus cycle d→b: b,c,d all reach each other AND
    // themselves; a reaches everything but is reached by nothing
    val e = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "b"))
      .toDF("src", "dst")
    val got = TriplePatterns.closureFixpoint(e).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val cyc = Set("b", "c", "d")
    val expect = cyc.flatMap(x => cyc.map(x -> _)) ++ cyc.map("a" -> _)
    assert(got == expect)
    // early exit: a DAG chain converges in depth rounds under any cap
    val dag = TriplePatterns.closureFixpoint(
      Seq(("1", "2"), ("2", "3")).toDF("src", "dst")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(dag == Set(("1", "2"), ("2", "3"), ("1", "3")))
  }

  test("Scc.reachability equals a driver-side closure on a mixed graph") {
    import spark.implicits._
    import graft.kg.Scc
    // two cycles bridged into a DAG, a singleton self-loop, a pendant:
    // {1,2,3} cycle → 4 → {5,6} cycle → 7; 8→8; 9→1
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (5L, 6L), (6L, 5L), (6L, 7L), (8L, 8L), (9L, 1L)).toDF("src", "dst")
    // reference: iterate boolean matrix closure on the driver
    val es = Seq((1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 5),
      (6, 7), (8, 8), (9, 1))
    var reach = es.toSet
    var grew = true
    while (grew) {
      val next = reach ++ (for ((a, b) <- reach; (c, d) <- es if b == c)
        yield (a, d))
      grew = next.size != reach.size
      reach = next
    }
    val got = Scc.reachability(spark, edges).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt)).toSet
    assert(got == reach)
  }

  test("bgpDescribe returns the symmetric CBD of the bound entities") {
    import spark.implicits._
    import graft.kg.TriplePatterns
    val tr = Seq(
      ("e1", "uses_tool", "doc://1"), ("e1", "performs", "doc://2"),
      ("e2", "cooccurs_with", "e1"), ("e2", "performs", "doc://3"),
      ("e3", "performs", "doc://4")).toDF("subj", "pred", "obj")
    // ?e binds only e1; description = e1's outgoing facts PLUS the
    // incoming cooccurs edge; e2's own performs and e3 stay out
    val got = TriplePatterns.bgpDescribe(tr,
      Seq(("?e", "uses_tool", "?d")), "?e").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(
      ("e1", "uses_tool", "doc://1"), ("e1", "performs", "doc://2"),
      ("e2", "cooccurs_with", "e1")))
    // unbound variable name is a caller bug, not a silent empty result
    intercept[IllegalArgumentException] {
      TriplePatterns.bgpDescribe(tr, Seq(("?e", "uses_tool", "?d")), "?zz")
    }
  }

  test("KMeans.assign: hand-computed 2-round Lloyd with a reassignment") {
    import spark.implicits._
    import graft.sim.KMeans
    // v2 starts as its own seed centroid, then round 2 reassigns it to
    // cluster 1 after the means move — the step that distinguishes
    // Lloyd from one-shot nearest-seed
    val emb = Seq(
      (1L, Seq(0.0f, 0.0f)), (2L, Seq(0.1f, 0.0f)),
      (3L, Seq(10.0f, 10.0f)), (4L, Seq(10.0f, 10.1f)))
      .toDF("vec_id", "embedding")
    val got = KMeans.assign(spark, emb, 2, 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      1L -> ((1L, 0L)), 2L -> ((1L, 1000000L)),
      3L -> ((2L, 2178000000L)), 4L -> ((2L, 2245000000L))))
  }

  test("Hll.tokenSketch matches a driver-side register replay") {
    import spark.implicits._
    import graft.quality.Hll
    val docs = Seq((1L, "alpha beta gamma  alpha"), (2L, "delta beta eps"))
      .toDF("doc_id", "text")
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val regs = Array.fill(64)(0L)
    Seq("alpha", "beta", "gamma", "delta", "eps").foreach { tok =>
      val h = java.lang.Long.parseLong(md5hex(tok).take(15), 16)
      val w = h >> 6
      val bitlen = 64 - java.lang.Long.numberOfLeadingZeros(w)
      val rank = math.min(31L, 55L - bitlen)
      val b = (h % 64).toInt
      regs(b) = math.max(regs(b), rank)
    }
    val s = regs.map(r => 1L << (31 - r)).sum
    val est = Hll.AlphaMicro * 4096L * 2147483648L / s
    val got = Hll.tokenSketch(spark, docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == regs.zipWithIndex
      .map { case (r, b) => (b.toLong, r, est) }.toSet)
    // set semantics by construction: duplicate tokens change nothing
    val dup = Hll.tokenSketch(spark,
      Seq((1L, "alpha alpha alpha beta gamma delta beta eps"))
        .toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(dup == got)
  }

  test("bgpAggregate sum and avg fold exact integers per group") {
    import spark.implicits._
    import graft.kg.TriplePatterns
    val tr = Seq(
      ("d1", "qty", "10"), ("d1", "src", "a"),
      ("d2", "qty", "20"), ("d2", "src", "a"),
      ("d3", "qty", "7"), ("d3", "src", "b")).toDF("subj", "pred", "obj")
    val got = TriplePatterns.bgpAggregate(tr,
      Seq(("?d", "qty", "?v"), ("?d", "src", "?s")),
      groupBy = Seq("?s"),
      aggs = Seq(("sum", "?v", "tot"), ("avg", "?v", "avg_v")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got == Map("a" -> ((30L, 15L)), "b" -> ((7L, 7L))))
  }

  test("Intervals.coalesceIslands merges touching, splits gapped") {
    import spark.implicits._
    import graft.kg.Intervals
    // key 1: [0,10] overlaps [5,15], [15,20] TOUCHES (closed semantics)
    // → one island; [30,40] gapped → its own. key 2: single interval
    val iv = Seq(
      (1L, 10L, 0L, 10L), (1L, 11L, 5L, 15L), (1L, 12L, 15L, 20L),
      (1L, 13L, 30L, 40L), (2L, 20L, 7L, 9L))
      .toDF("user_id", "event_id", "s", "e")
    val got = Intervals.coalesceIslands(iv, "user_id", "event_id", "s", "e")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == Set(
      (1L, 1L, 0L, 20L, 3L), (1L, 2L, 30L, 40L, 1L), (2L, 1L, 7L, 9L, 1L)))
    // an interval CONTAINED in a prior one must not split the island:
    // [0,100], [10,20], [30,40] is ONE island (running-max, not lag)
    val contained = Intervals.coalesceIslands(
      Seq((1L, 1L, 0L, 100L), (1L, 2L, 10L, 20L), (1L, 3L, 30L, 40L))
        .toDF("user_id", "event_id", "s", "e"),
      "user_id", "event_id", "s", "e").collect()
    assert(contained.map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq == Seq((0L, 100L, 3L)))
  }

  test("SetSim.join: closed form and lossless vs brute force") {
    import spark.implicits._
    import graft.dedup.SetSim
    val items = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"), (1L, "d"),
      (2L, "a"), (2L, "b"), (2L, "c"), (2L, "e"),
      (3L, "z")).map { case (d, i) => (d, i) }.toDF("doc_id", "item")
    val got = SetSim.join(spark, items, 500000L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == Set((1L, 2L, 3L, 5L, 600000L)))
    // lossless property on a pseudo-random instance: every pair the
    // brute force finds, the prefix-filtered join must also find
    val rnd = (0 until 30).flatMap { d =>
      (0 until 12).map(i => (d.toLong, s"t${(d * 7 + i * 11) % 40}"))
    }.distinct
    val sets = rnd.groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).toSet }
    val brute = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) & sets(b)).size
      uni = (sets(a) | sets(b)).size
      if inter * 1000000L >= uni * 500000L
    } yield (a, b, inter.toLong, uni.toLong,
        inter * 1000000L / uni)).toSet
    val eng = SetSim.join(spark, rnd.toDF("doc_id", "item"), 500000L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(eng == brute)
  }

  test("Bloom: no false negatives; false positives match a driver replay") {
    import spark.implicits._
    import graft.core.Bloom
    val members = (1L to 40L).filter(_ % 3 == 0)
    val keys = members.toDF("k")
    val m = 64
    val bits = Bloom.build(keys, "k", m, 3)
    val probe = (1L to 200L).toDF("k")
    val got = Bloom.mightContain(probe, "k", bits, m, 3)
      .collect().map(_.getLong(0)).toSet
    // driver replay of the same md5 bit math
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def bit(key: Long, i: Int) =
      java.lang.Long.parseLong(md5hex(s"$key#$i").take(8), 16) % m
    val bitSet = members.flatMap(k => (0 until 3).map(i => bit(k, i))).toSet
    val expect = (1L to 200L)
      .filter(k => (0 until 3).forall(i => bitSet(bit(k, i)))).toSet
    assert(got == expect)
    assert(members.toSet.subsetOf(got)) // the Bloom guarantee
    // multiplicity preserved: duplicate probe rows survive as rows
    val dup = Bloom.mightContain(
      Seq(3L, 3L, 5L).toDF("k"), "k", bits, m, 3).count()
    assert(dup == 2L || dup == 3L) // 3 twice; 5 only if a false positive
    assert(dup == (if (expect(5L)) 3L else 2L))
  }

  test("Funnel.run: conversion, out-of-window, pre-anchor, and no-anchor") {
    import spark.implicits._
    import graft.events.Funnel
    // u1 converts fully; u2's click lands outside the 7-day window (so
    // the later purchase can't count either); u3's first click precedes
    // the view anchor (ignored) and its purchase precedes the counted
    // click; u4 never views — no row at all
    val ev = Seq(
      (1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 300L),
      (2L, "view", 100L), (2L, "click", 604901L), (2L, "purchase", 604902L),
      (3L, "click", 50L), (3L, "view", 100L), (3L, "click", 180L),
      (3L, "purchase", 170L),
      (4L, "click", 10L))
      .toDF("user_id", "event_type", "ep")
      .withColumn("ts", col("ep").cast("timestamp"))
    val got = Funnel.run(ev, Seq("view", "click", "purchase"), 604800L)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
          r.getLong(4)))).toMap
    assert(got == Map(
      1L -> ((Some(100L), Some(200L), Some(300L), 3L)),
      2L -> ((Some(100L), None, None, 1L)),
      3L -> ((Some(100L), Some(180L), None, 2L))))
  }

  test("EquiDepth.histogram: uniform 1..16 into four exact buckets") {
    import spark.implicits._
    import graft.core.EquiDepth
    val df = (1 to 16).map(_.toDouble).toDF("x")
    val got = EquiDepth.histogram(df, "x", 4).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    // boundaries (round-4): 4.75, 8.5, 12.25 → 4 rows per bucket
    assert(got == Map(
      0L -> ((4L, 4L, 1.0, 4.0)), 1L -> ((4L, 4L, 5.0, 8.0)),
      2L -> ((4L, 4L, 9.0, 12.0)), 3L -> ((4L, 4L, 13.0, 16.0))))
  }

  test("EditJoin.pairs: FastSS candidates complete, verification exact") {
    import spark.implicits._
    import graft.text.EditJoin
    // acb shares deletion variants with abc but sits at distance 2 —
    // the verification must kill it; ab~acb is a middle insertion the
    // blocking must FIND (they share variant 'ab')
    val names = Seq("abc", "abd", "ab", "xabc", "acb", "zzz").toDF("n")
    val got = EditJoin.pairs(names, "n").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(
      ("ab", "abc", 1L), ("ab", "abd", 1L), ("ab", "acb", 1L),
      ("abc", "abd", 1L), ("abc", "xabc", 1L)))
  }

  test("Sssp.routingTree: parents respect dist AND seed consistency") {
    import spark.implicits._
    import graft.kg.Sssp
    // node 3 is dist 2 from both seeds; its label is seed 1, so node 4
    // (dist-valid: 0 + 2 = 2, but seed 4) must NOT become its parent
    val g = Seq((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 5L), (3L, 4L, 2L))
      .toDF("u", "v", "w")
    val got = Sssp.routingTree(spark, g, Seq(1L, 4L).toDF("node"), 6)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(got == Map(
      1L -> ((0L, 1L, None)), 4L -> ((0L, 4L, None)),
      2L -> ((1L, 1L, Some(1L))), 3L -> ((2L, 1L, Some(2L)))))
  }

  test("weightedWalks: md5 interval choices replayed on the driver") {
    import spark.implicits._
    import graft.kg.RandomWalks
    val edges = Seq((1L, 2L, 1L), (1L, 3L, 3L), (2L, 3L, 2L))
      .toDF("u", "v", "w")
    val got = RandomWalks.weightedWalks(spark, edges, 2, 3).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // driver replay: cumulative intervals over ascending neighbors
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val adj = Map( // node -> neighbors ascending with weights
      1L -> Seq((2L, 1L), (3L, 3L)),
      2L -> Seq((1L, 1L), (3L, 2L)),
      3L -> Seq((1L, 3L), (2L, 2L)))
    val expect = (for {
      node <- Seq(1L, 2L, 3L); r <- 0 until 2
    } yield {
      val walkId = node * 2 + r
      var cur = node
      val path = new StringBuilder(cur.toString)
      (1 to 3).foreach { step =>
        val ns = adj(cur)
        val tot = ns.map(_._2).sum
        val pick = java.lang.Long.parseLong(
          md5hex(s"$walkId|$step").take(8), 16) % tot
        var acc = 0L
        val nxt = ns.find { case (_, w) =>
          acc += w; pick < acc }.get._1
        cur = nxt; path.append("->").append(nxt)
      }
      walkId -> path.toString
    }).toMap
    assert(got == expect)
  }

  test("Skyline.pareto: sweep frontier with same-x collapse and ties") {
    import spark.implicits._
    import graft.core.Skyline
    // (3,4) dominated by (2,3); (5,1) dominated by (4,1) on the tie;
    // (2,9) collapses into x=2's min; duplicates are harmless
    val pts = Seq((1.0, 5.0), (2.0, 3.0), (2.0, 3.0), (2.0, 9.0),
      (3.0, 4.0), (4.0, 1.0), (5.0, 1.0), (6.0, 0.0)).toDF("x", "y")
    val got = Skyline.pareto(pts, "x", "y", buckets = 2).collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(got == Set((1.0, 5.0), (2.0, 3.0), (4.0, 1.0), (6.0, 0.0)))
    // single-bucket degenerate (all x equal) keeps exactly the min y
    val flat = Skyline.pareto(
      Seq((7.0, 2.0), (7.0, 1.0)).toDF("x", "y"), "x", "y").collect()
    assert(flat.map(r => (r.getDouble(0), r.getDouble(1))).toSeq ==
      Seq((7.0, 1.0)))
  }

  test("bgpSelect pages deterministically under DISTINCT + ORDER + OFFSET") {
    import spark.implicits._
    import graft.kg.TriplePatterns
    val tr = Seq(
      ("e3", "performs", "d1"), ("e1", "performs", "d2"),
      ("e2", "performs", "d3"), ("e4", "performs", "d4"),
      ("e1", "performs", "d2")).toDF("subj", "pred", "obj")
    val got = TriplePatterns.bgpSelect(tr, Seq(("?e", "performs", "?d")),
      distinct = true, orderBy = Seq("-e"), offset = 1, limit = Some(2))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("e3", "d1"), ("e2", "d3")))
    // unknown order key is a caller bug
    intercept[IllegalArgumentException] {
      TriplePatterns.bgpSelect(tr, Seq(("?e", "performs", "?d")),
        orderBy = Seq("zz"))
    }
  }

  test("Rendezvous.assign matches a driver replay; removals are minimal") {
    import spark.implicits._
    import graft.core.Rendezvous
    val keys = (1L to 120L).toDF("k")
    val five = Seq("s-a", "s-b", "s-c", "s-d", "s-e")
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h(k: Long, s: String) =
      java.lang.Long.parseLong(md5hex(s"$k#$s").take(8), 16) % 1000000007L
    val got = Rendezvous.assign(keys, "k", five).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = (1L to 120L).map(k =>
      k -> five.map(s => (h(k, s), s)).max._2).toMap
    assert(got == expect)
    // the HRW property: dropping one shard moves ONLY its keys
    val four = Rendezvous.assign(keys, "k", five.dropRight(1)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    (1L to 120L).foreach { k =>
      if (got(k) != "s-e") assert(four(k) == got(k))
    }
    assert(got.values.toSet.contains("s-e")) // the drop actually moved some
  }

  test("Calibration.table bins fixed-width with capped top bin") {
    import spark.implicits._
    import graft.quality.Calibration
    val df = Seq((0.05, true), (0.05, false), (0.95, true), (1.0, true))
      .toDF("score", "out")
    val got = Calibration.table(df, "score", "out", 10).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got == Map(
      0L -> ((2L, 0.05, 0.5)), 9L -> ((2L, 0.975, 1.0))))
  }

  test("Mis: independent, maximal, and equal to a driver Luby replay") {
    import spark.implicits._
    import graft.kg.Mis
    val tri = (0 until 40).map { i =>
      val a = (i * 13 + 3) % 16; val b = (i * 23 + 7) % 16
      (math.min(a, b).toLong, math.max(a, b).toLong)
    }.filter(t => t._1 != t._2).distinct
    val (out, rounds) = Mis.misWithRounds(spark, tri.toDF("u", "v"))
    val got = out.collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(rounds >= 1)
    // driver replay with the identical pk arithmetic
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def pk(n: Long) = java.lang.Long.parseLong(md5hex(n.toString).take(8),
      16) % 1000000007L * 2147483648L + n
    val adj = (tri ++ tri.map(_.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    var active = adj.keySet
    var mis = Set.empty[Long]
    while (active.nonEmpty) {
      val w = active.filter(n =>
        (adj(n) & active).forall(m => pk(n) < pk(m)))
      mis ++= w
      active = active -- w -- w.flatMap(adj)
    }
    assert(got == adj.keySet.map(n => n -> mis(n)).toMap)
    // structural: independence and maximality
    tri.foreach { case (u, v) => assert(!(got(u) && got(v))) }
    got.collect { case (n, false) => n }.foreach(n =>
      assert(adj(n).exists(got)))
  }

  test("RPQ closure: (performs/^consumes)+ reaches through the cycle") {
    import spark.implicits._
    import graft.kg.TriplePatterns
    val tr = Seq(
      ("e1", "performs", "d1"), ("e2", "consumes", "d1"),
      ("e2", "performs", "d2"), ("e3", "consumes", "d2"),
      ("e3", "performs", "d3"), ("e1", "consumes", "d3"))
      .toDF("subj", "pred", "obj")
    val hop = TriplePatterns.pathSequence(tr, Seq("performs", "^consumes"))
      .select(col("subj").as("src"), col("obj").as("dst"))
    val got = TriplePatterns.closureFixpoint(hop).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val es = Set("e1", "e2", "e3")
    assert(got == es.flatMap(a => es.map(a -> _))) // full cyclic closure
  }

  test("Hll.merge of disjoint shards equals the whole-corpus sketch") {
    import spark.implicits._
    import graft.quality.Hll
    val a = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val b = Seq((2L, "beta delta eps zeta")).toDF("doc_id", "text")
    val all = Seq((1L, "alpha beta gamma"), (2L, "beta delta eps zeta"))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows(Hll.merge(Hll.tokenSketch(spark, a),
      Hll.tokenSketch(spark, b))) == rows(Hll.tokenSketch(spark, all)))
  }

  test("Scc.bowtie: core, in, out, and disconnected-other regions") {
    import spark.implicits._
    import graft.kg.Scc
    // cycle {1,2,3} is the (largest) core; 6→0→1 feeds IN; 3→4→5 is
    // OUT; the separate 2-cycle {7,8} is neither — OTHER
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (0L, 1L), (6L, 0L),
      (3L, 4L), (4L, 5L), (7L, 8L), (8L, 7L)).toDF("src", "dst")
    val got = Scc.bowtie(spark, edges).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(
      1L -> "core", 2L -> "core", 3L -> "core",
      0L -> "in", 6L -> "in", 4L -> "out", 5L -> "out",
      7L -> "other", 8L -> "other"))
  }

  test("KCore.strengthCoreWithRounds: cascade peel to the exact fixpoint") {
    import spark.implicits._
    import graft.kg.KCore
    // chain 1-2(12), 2-3(6), 3-4(6), s=12: node 4 falls (6), then 3
    // (its surviving strength 6), then fixpoint at the single edge
    val (str, rounds) = KCore.strengthCoreWithRounds(spark,
      Seq((1L, 2L, 12L), (2L, 3L, 6L), (3L, 4L, 6L)).toDF("u", "v", "w"),
      12L)
    assert(rounds == 3)
    assert(str.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 12L, 2L -> 12L))
    // empty core when everything peels
    val (gone, _) = KCore.strengthCoreWithRounds(spark,
      Seq((1L, 2L, 3L)).toDF("u", "v", "w"), 100L)
    assert(gone.count() == 0L)
  }

  test("bgpAsk answers existence without enumerating solutions") {
    import spark.implicits._
    import graft.kg.TriplePatterns
    val tr = Seq(("e1", "performs", "doc://1")).toDF("subj", "pred", "obj")
    assert(TriplePatterns.bgpAsk(tr, Seq(("?e", "performs", "?d")))
      .collect().map(_.getBoolean(0)).toSeq == Seq(true))
    assert(TriplePatterns.bgpAsk(tr, Seq(("?e", "defragments", "?d")))
      .collect().map(_.getBoolean(0)).toSeq == Seq(false))
    // a two-pattern BGP with no join partner is also a clean false
    assert(TriplePatterns.bgpAsk(tr,
      Seq(("?e", "performs", "?d"), ("?d", "in_lang", "?lg")))
      .collect().map(_.getBoolean(0)).toSeq == Seq(false))
  }
}
