package graft

import graft.kg.ConnectedComponents
import graft.multimodal.Media
import graft.quality.TextQuality
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit/fuzz coverage for the auxiliary operators: connected components vs
  * a union-find reference, multimodal stubs, text-quality functions. */
class OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-ops-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("connected components match union-find on random graphs (seeded fuzz)") {
    import spark.implicits._
    val rnd = new scala.util.Random(2024)
    (1 to 3).foreach { _ =>
      val nNodes = 40 + rnd.nextInt(40)
      val edges = Seq.fill(nNodes)(
        (f"n${rnd.nextInt(nNodes)}%03d", f"n${rnd.nextInt(nNodes)}%03d"))

      // reference union-find with min-label roots
      val parent = scala.collection.mutable.Map.empty[String, String]
      def find(x: String): String = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      def union(a: String, b: String): Unit = {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      edges.foreach { case (a, b) => union(a, b) }
      val expected = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
        .map(n => n -> find(n)).toMap

      val got = ConnectedComponents.run(spark, edges.toDF("src", "dst"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(got == expected)
    }
  }

  test("large-star/small-star CC matches min-label CC and union-find (seeded fuzz)") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    (1 to 3).foreach { _ =>
      val nNodes = 30 + rnd.nextInt(40)
      val edges = Seq.fill(nNodes)(
        (f"n${rnd.nextInt(nNodes)}%03d", f"n${rnd.nextInt(nNodes)}%03d"))
        .filter { case (a, b) => a != b }
      val df = edges.toDF("src", "dst")
      val a = ConnectedComponents.run(spark, df)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val b = ConnectedComponents.runStar(spark, df)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(a == b)
    }
    // long chain: star variant must also find the single component
    val chain = (0 until 20).map(i => (f"c$i%02d", f"c${i + 1}%02d")).toDF("src", "dst")
    val got = ConnectedComponents.runStar(spark, chain).collect()
    assert(got.length == 21 && got.forall(_.getString(1) == "c00"))
  }

  test("real PNG decode round-trips MediaGen's closed forms") {
    import graft.fixtures.MediaGen
    Seq(0L, 7L, 63L, 123L, 499L).foreach { id =>
      val m = Media.decodeImage(MediaGen.pngFor(id))
      assert(m.width == MediaGen.imgWidth(id) && m.height == MediaGen.imgHeight(id))
      assert(m.channels == 3)
      assert((m.mean_r, m.mean_g, m.mean_b) ==
        ((MediaGen.imgR(id).toDouble, MediaGen.imgG(id).toDouble, MediaGen.imgB(id).toDouble)))
    }
  }

  test("real resize re-encodes into the target box, identity when it fits") {
    import graft.fixtures.MediaGen
    val big = MediaGen.pngFor(63L) // 128×128
    val r = Media.decodeImage(Media.resizeImage(big, 48))
    assert(r.width == 48 && r.height == 48)
    assert(r.mean_r == MediaGen.imgR(63L).toDouble) // solid color survives resize
    val small = MediaGen.pngFor(0L) // 16×16
    assert(Media.resizeImage(small, 48) eq small)
  }

  test("real WAV decode recovers format, frame count, and exact sine peak") {
    import graft.fixtures.MediaGen
    Seq(0L, 11L, 250L, 499L).foreach { id =>
      val m = Media.decodeWav(MediaGen.wavFor(id))
      assert(m.sample_rate == MediaGen.WavSampleRate && m.channels == 1 && m.bits == 16)
      assert(m.n_frames == MediaGen.wavFrames(id))
      assert(m.peak == MediaGen.wavAmp(id))
      // quantized-sine RMS ≈ amp/√2 (quantization error < 1 LSB per sample)
      assert(math.abs(m.rms - MediaGen.wavAmp(id) / math.sqrt(2)) < 1.0)
    }
  }

  test("concatenated-PNG video splits on signature and decodes kept frames") {
    import graft.fixtures.MediaGen
    val id = 4L // 6 frames, stride 2 keeps 0,2,4
    val frames = Media.splitPngFrames(MediaGen.videoFor(id))
    assert(frames.length == MediaGen.videoFrameCount(id))
    val kept = frames.zipWithIndex.filter(_._2 % 2 == 0)
    kept.foreach { case (f, idx) =>
      val m = Media.decodeImage(f)
      assert(m.width == MediaGen.videoFrameWidth(id) && m.height == Media.decodeImage(f).height)
      assert(m.mean_r == MediaGen.videoFrameR(id, idx).toDouble)
    }
  }

  test("resizeMeta preserves aspect ratio within the target box") {
    import spark.implicits._
    val df = Seq((1, 1024, 512), (2, 100, 100)).toDF("id", "width", "height")
    val out = Media.resizeMeta(df, 256).collect().map(r =>
      r.getAs[Int]("id") -> (r.getAs[Int]("out_width"), r.getAs[Int]("out_height"))).toMap
    assert(out(1) == (256, 128))
    assert(out(2) == (100, 100)) // never upscale
  }

  test("frame sampling keeps every stride-th fixed-size frame") {
    import spark.implicits._
    val blob = Array.tabulate[Byte](300)(_.toByte)
    val df = Seq((7L, blob)).toDF("id", "blob")
    val frames = Media.sampleFrames(spark, df, "id", "blob", 64, 2).collect()
    // 300 bytes → frames of 64,64,64,64,44 → indices 0,2,4 kept
    assert(frames.map(_.getAs[Int]("frame_idx")).sorted.toSeq == Seq(0, 2, 4))
    assert(frames.find(_.getAs[Int]("frame_idx") == 4).get.getAs[Int]("frame_bytes") == 44)
  }

  test("PageRank matches closed forms on 2-cycle and dangling chain") {
    import spark.implicits._
    // symmetric 2-cycle: fixed point rank = 1.0 exactly for both nodes
    val cyc = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val rCyc = graft.kg.PageRank.run(spark, cyc, 10).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rCyc == Map("a" -> 1.0, "b" -> 1.0))
    // dangling chain a→b: a has no inflow (0.15); b = 0.15 + 0.85·0.15
    val chain = Seq(("a", "b")).toDF("src", "dst")
    val rCh = graft.kg.PageRank.run(spark, chain, 10).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rCh("a") == 0.15 && rCh("b") == 0.2775)
  }

  test("PageRank plan depth is bounded by checkpointing (no lineage blowup)") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")).toDF("src", "dst")
    def planLen(iters: Int): Int =
      graft.kg.PageRank.run(spark, edges, iters)
        .queryExecution.optimizedPlan.numberedTreeString.length
    // 12 iterations checkpoint at 5 and 10 ⇒ the final plan embeds ≤2
    // iteration layers; 4 iterations never checkpoint ⇒ 4 layers. Without
    // lineage truncation the 12-iter plan would be ~3× the 4-iter plan.
    assert(planLen(12) < planLen(4),
      "12-iteration plan should be SHALLOWER than an uncheckpointed 4-iteration plan")
  }

  test("degenerate docs: empty → no minhash signature; single-token → whole-token shingle") {
    import spark.implicits._
    val docs = Seq(
      (0L, ""), (1L, "   "),          // empty shingle sets — must never pair
      (2L, "hello"), (3L, "hello"),   // identical single-token docs — must pair
      (4L, "completely different words in this one"))
      .toDF("doc_id", "text")
    Seq(
      graft.dedup.Dedup.minhashPairs(spark, docs, 0.5),
      graft.dedup.Dedup.minhashPairsMd5(spark, docs, 0.5)).foreach { df =>
      val pairs = df.select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((2L, 3L)), s"got $pairs")
    }
  }

  test("hashed-TF vectors chain into the similarity stack (text→vector→pairs)") {
    import spark.implicits._
    val base = "spark hash join table scan merge sort customer vector stream " * 3
    val docs = Seq(
      (0L, base), (1L, base + " one extra tail"), (2L, "entirely unrelated words here now"))
      .toDF("doc_id", "text")
    val vecs = graft.sim.TextVec.vectors(spark, docs, 64)
      .select(col("doc_id").as("vec_id"),
        org.apache.spark.sql.functions.transform(col("embedding"),
          x => x.cast("float")).as("embedding"))
    val pairs = graft.sim.Ann.cosineNearDupPairs(spark, vecs, 64, 2, 0.8)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L))) // near-identical texts pair; unrelated doesn't
    // unit norm (to within the 6-decimal component rounding)
    val n2 = graft.sim.TextVec.vectorOf(base, 64).map(x => x * x).sum
    assert(math.abs(n2 - 1.0) < 1e-5)
  }

  test("md5 hash primitives match the DuckDB formulas bit-exactly") {
    import graft.dedup.Dedup
    // pinned against DuckDB: ('0x' || substr(md5('abc'),1,8))::BIGINT
    assert(Dedup.md5Hash32("abc") == 2416005272L)
    // pinned against DuckDB: md5_number_lower('spark')
    assert(Dedup.md5Hash64("spark") == 7293996656543585851L)
  }

  test("md5 and murmur MinHash variants find the same strong near-dup pairs") {
    import spark.implicits._
    val base = "spark hash join table scan merge sort customer vector stream " * 4
    val docs = Seq(
      (0L, base), (1L, base + " extra tail words"), (2L, "completely different text here"))
      .toDF("doc_id", "text")
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val md5P = pairsOf(graft.dedup.Dedup.minhashPairsMd5(spark, docs, 0.5))
    val murP = pairsOf(graft.dedup.Dedup.minhashPairs(spark, docs, 0.5))
    assert(md5P == Set((0L, 1L)) && murP == Set((0L, 1L)))
  }

  test("language-ID picks the right profile on natural text") {
    assert(TextQuality.detectLang("the house and the garden of the king") == "en")
    assert(TextQuality.detectLang("la casa de la reina que canta") == "es")
    assert(TextQuality.detectLang("die Kinder und die Schule sind schön") == "de")
    assert(TextQuality.detectLang("") == "und")
  }

  test("codegen'd langIdCol equals the scalar detectLang on corpus and edges") {
    import spark.implicits._
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val edges = Seq((9001L, ""), (9002L, "   "), (9003L, "ab"),
      (9004L, "the house and the garden"), (9005L, "la casa de la ciudad"))
    val all = (corpus.toSeq ++ edges).toDF("doc_id", "text")
    val viaCol = graft.quality.TextQuality.langId(spark, all)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (corpus.toSeq ++ edges).foreach { case (id, text) =>
      assert(viaCol(id) == graft.quality.TextQuality.detectLang(text),
        s"divergence on doc $id")
    }
  }

  test("fingerprint is whitespace/case-normalized and deterministic") {
    val a = TextQuality.fingerprint("Hello   World")
    val b = TextQuality.fingerprint("hello world")
    val c = TextQuality.fingerprint("hello\tworld ")
    assert(a == b && b == c)
    assert(TextQuality.fingerprint("different text") != a)
  }

  test("minhash truncation cap is observable (accumulator counts cut buckets)") {
    import spark.implicits._
    // > MaxBucketSize identical docs: every band puts all of them in one
    // bucket, so each of the 16 bands truncates once
    val n = graft.dedup.Dedup.MaxBucketSize + 50
    val docs = (0 until n).map(i => (i.toLong, "same text for every doc here"))
      .toDF("doc_id", "text")
    val acc = spark.sparkContext.longAccumulator("trunc-test")
    val pairs = graft.dedup.Dedup.minhashPairs(spark, docs, 0.5, acc)
    val nPairs = pairs.count()
    assert(acc.value == graft.dedup.Dedup.Bands.toLong,
      s"expected one truncation per band, got ${acc.value}")
    // pair fan-out stayed bounded by the cap
    val cap = graft.dedup.Dedup.MaxBucketSize.toLong
    assert(nPairs == cap * (cap - 1) / 2)
  }

  test("multi-probe LSH ANN achieves full recall on planted clusters") {
    import spark.implicits._
    // 20 tight clusters of 30 vectors each: cluster center + tiny seeded
    // jitter. The true top-10 of a member's query vector is inside its
    // cluster; multi-probe (radius 1) must find the same set brute force
    // does, with NO full-scan fallback in the plan.
    val rnd = new scala.util.Random(11)
    val dim = 16
    val centers = Array.fill(20)(Array.fill(dim)(rnd.nextGaussian()))
    val vecs = for {
      c <- centers.indices
      j <- 0 until 30
    } yield ((c * 30 + j).toLong,
      centers(c).map(x => (x + rnd.nextGaussian() * 0.01).toFloat).toSeq)
    val emb = vecs.toDF("vec_id", "embedding")
    val query = vecs(5)._2.map(_.toDouble).toArray // member of cluster 0

    val brute = graft.sim.Ann.bruteForceTopK(emb, query, 10)
      .collect().map(_.getLong(0)).toSet
    val lsh = graft.sim.Ann.lshTopK(spark, emb, query, 10, dim, 8, probeRadius = 1)
      .collect().map(_.getLong(0)).toSet
    assert(lsh == brute, s"recall miss: ${brute.diff(lsh)}")
  }

  test("IVF ANN achieves full recall on planted clusters; training is deterministic") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val dim = 16
    val centers = Array.fill(20)(Array.fill(dim)(rnd.nextGaussian()))
    val vecs = for {
      c <- centers.indices
      j <- 0 until 30
    } yield ((c * 30 + j).toLong,
      centers(c).map(x => (x + rnd.nextGaussian() * 0.01).toFloat).toSeq)
    val emb = vecs.toDF("vec_id", "embedding")
    val query = vecs(5)._2.map(_.toDouble).toArray

    val brute = graft.sim.Ann.bruteForceTopK(emb, query, 10)
      .collect().map(_.getLong(0)).toSet
    val ivf = graft.sim.Ivf.ivfTopK(spark, emb, query, 10,
      nCells = 16, iters = 5, nProbe = 2, sampleN = 600)
      .collect().map(_.getLong(0)).toSet
    assert(ivf == brute, s"recall miss: ${brute.diff(ivf)}")

    val sample = vecs.map(_._2.map(_.toDouble).toArray).toArray
    val c1 = graft.sim.Ivf.train(sample, 16, 5)
    val c2 = graft.sim.Ivf.train(sample, 16, 5)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
  }

  test("triangle count matches closed forms and a brute-force reference") {
    import spark.implicits._
    def count(edges: Seq[(Long, Long)]): Long =
      graft.kg.Triangles.count(spark,
        graft.kg.Triangles.canonicalEdges(edges.toDF("u", "v"), "u", "v"))
        .head().getLong(0)

    // K4 has C(4,3)=4 triangles; a 5-cycle has none; duplicate/reversed/
    // self-loop edges must not change the count
    val k4 = for (i <- 0L to 3L; j <- 0L to 3L if i < j) yield (i, j)
    assert(count(k4) == 4L)
    assert(count(k4 ++ k4.map(_.swap) ++ Seq((2L, 2L))) == 4L)
    assert(count(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 0L))) == 0L)

    // seeded random graph vs O(n³) brute force
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(60)((rnd.nextInt(15).toLong, rnd.nextInt(15).toLong))
      .filter { case (a, b) => a != b }
    val adj = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    val nodes = adj.map(_._1).toSeq.sorted
    val brute = (for {
      a <- nodes; b <- nodes if a < b && adj((a, b))
      c <- nodes if b < c && adj((b, c)) && adj((a, c))
    } yield 1).size.toLong
    assert(count(edges) == brute)
    // the shuffled-closure variant (chosen automatically above the edge
    // limit) counts identically
    val shuffled = graft.kg.Triangles.count(spark,
      graft.kg.Triangles.canonicalEdges(edges.toDF("u", "v"), "u", "v"),
      maxBroadcastEdges = 0L).head().getLong(0)
    assert(shuffled == brute)
  }

  test("bounded-hop BFS matches closed forms and a reference BFS on random graphs") {
    import spark.implicits._
    def run(edges: Seq[(Long, Long)], seeds: Seq[Long], k: Int): Map[Long, Long] = {
      val canon = graft.kg.Triangles.canonicalEdges(
        edges.toDF("u", "v"), "u", "v")
      graft.kg.Bfs.distances(spark, canon, seeds.toDF("node"), k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    // chain 1-2-3-4-5 from node 1: hop bound cuts at 3; node 9 disconnected
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (8L, 9L))
    assert(run(chain, Seq(1L), 3) == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    // two seeds: every node takes the nearer one
    assert(run(chain, Seq(1L, 5L), 1) ==
      Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 4L -> 1L))
    // seeded fuzz vs an in-memory reference BFS
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { _ =>
      val n = 40
      val edges = (1 to 120).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
        .view.mapValues(_.map(_._2).distinct).toMap
      val seed = edges.head._1
      var ref = Map(seed -> 0L)
      var frontier = Seq(seed)
      (1 to 2).foreach { d =>
        frontier = frontier.flatMap(adj.getOrElse(_, Nil))
          .distinct.filterNot(ref.contains)
        ref ++= frontier.map(_ -> d.toLong)
      }
      assert(run(edges, Seq(seed), 2) == ref)
    }
  }

  test("snapshot merge: broadcast-delta and full-outer variants agree; ops are exact") {
    import spark.implicits._
    val base = Seq(("a", 1L, 1L), ("b", 2L, 1L), ("c", 3L, 1L))
      .toDF("k", "val", "rev")
    val delta = Seq(("b", 20L, 2L), ("d", 40L, 2L)).toDF("k", "val", "rev")

    val merged = graft.kg.SnapshotMerge.merge(base, delta, Seq("k"))
      .collect().map(r => (r.getAs[String]("k"), r.getAs[Long]("val"),
        r.getAs[Long]("rev"), r.getAs[String]("op"))).toSet
    assert(merged == Set(
      ("a", 1L, 1L, "keep"), ("c", 3L, 1L, "keep"),
      ("b", 20L, 2L, "update"), ("d", 40L, 2L, "insert")))

    val fo = graft.kg.SnapshotMerge.mergeFullOuter(base, delta, Seq("k"),
      Seq("val", "rev"))
      .collect().map(r => (r.getAs[String]("k"), r.getAs[Long]("val"),
        r.getAs[Long]("rev"), r.getAs[String]("op"))).toSet
    assert(fo == merged)
  }

  test("snapshot merge rejects a multi-match delta (duplicate keys) like lakehouse MERGE") {
    import spark.implicits._
    val base = Seq(("a", 1L, 1L)).toDF("k", "val", "rev")
    val dupDelta = Seq(("a", 20L, 2L), ("a", 21L, 2L)).toDF("k", "val", "rev")
    val e = intercept[IllegalArgumentException] {
      graft.kg.SnapshotMerge.merge(base, dupDelta, Seq("k"))
    }
    assert(e.getMessage.contains("duplicate key"))
    // explicit opt-out keeps the old composed behavior for callers that
    // pre-deduplicate elsewhere
    val rows = graft.kg.SnapshotMerge
      .merge(base, dupDelta.dropDuplicates("k"), Seq("k"))
      .collect()
    assert(rows.length == 1 && rows.head.getAs[String]("op") == "update")
  }

  test("heavy-hitter profile is exact and count-min sketch stays inside its error bound") {
    import spark.implicits._
    // one hot key (90 rows) over 10 cold keys (1 row each)
    val rows = (Seq.fill(90)("hot") ++ (0 until 10).map(i => s"k$i")).toDF("key")
    val hh = graft.quality.Skew.heavyHitters(rows, "key", 3).collect()
    assert(hh.head.getAs[String]("key") == "hot")
    assert(hh.head.getAs[Long]("cnt") == 90L)
    assert(hh.head.getAs[Double]("frac") == 0.9)
    // mean count = 100/11; ceil(90 / (100/11)) = ceil(9.9) = 10
    assert(hh.head.getAs[Long]("salt_factor") == 10L)
    assert(hh(1).getAs[Long]("cnt") == 1L)

    // the sketch alternative: eps=0.01 ⇒ overcount ≤ eps·N = 1 at 99% conf
    val sketchBytes = rows
      .agg(expr("count_min_sketch(key, 0.01d, 0.99d, 42)")).head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketchBytes))
    val est = cms.estimateCount("hot")
    assert(est >= 90L && est <= 91L, s"cms estimate $est outside [90, 91]")
  }

  test("decontamination finds cross-split 3-gram overlap with exact shared counts") {
    import spark.implicits._
    // train doc 1 grams: {a b c, b c d, c d e}; eval doc 10 grams:
    // {x b c, b c d, c d e, d e y} → 2 shared; doc 11 has <3 tokens
    val train = Seq((1L, "a b c d e"), (2L, "p q r s")).toDF("doc_id", "text")
    val eval = Seq((10L, "x b c d e y"), (11L, "zz ww")).toDF("doc_id", "text")
    def pairs(min: Long) =
      graft.dedup.Decontam.contaminatedPairs(train, eval, min, n = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs(2L) == Set((10L, 1L, 2L)))
    assert(pairs(3L) == Set.empty)
    // repeated gram inside one doc counts once (distinct-per-doc)
    val evalRep = Seq((20L, "b c d b c d")).toDF("doc_id", "text")
    val gotRep = graft.dedup.Decontam.contaminatedPairs(train, evalRep, 1L, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotRep == Set((20L, 1L, 1L)))
  }

  test("gram fingerprints match a JVM reference across random corpora and gram lengths (fuzz)") {
    import spark.implicits._
    def refFingerprints(text: String, n: Int): Set[Long] = {
      val toks = text.trim.split("\\s+").toSeq.filter(_.nonEmpty)
      if (toks.size < n) Set.empty
      else toks.sliding(n).map(_.mkString(" ")).toSet.map { g: String =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(g.getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString.take(12)
        java.lang.Long.parseLong(hex, 16)
      }
    }
    val rnd = new scala.util.Random(11)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "x", "yy", "z1")
    (1 to 4).foreach { _ =>
      val n = 2 + rnd.nextInt(5) // gram length 2..6
      val docs = (0L until 12L).map { id =>
        val len = rnd.nextInt(12) // includes < n token docs (emit nothing)
        (id, (0 until len).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val got = graft.dedup.Decontam
        .gramFingerprints(docs.toDF("doc_id", "text"), n)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val want = docs.map { case (id, t) => id -> refFingerprints(t, n) }
        .filter(_._2.nonEmpty).toMap
      assert(got == want, s"n=$n mismatch")
    }
  }

  test("decontamination default is 13-grams: a 13-word shared run matches, a 12-word run doesn't") {
    import spark.implicits._
    val run13 = (1 to 13).map(i => s"w$i").mkString(" ")
    val run12 = (1 to 12).map(i => s"v$i").mkString(" ")
    val train = Seq(
      (1L, s"prefix $run13 suffix"),
      (2L, s"other $run12 tail pad pad2")).toDF("doc_id", "text")
    val eval = Seq(
      (10L, s"intro $run13 outro"),
      (11L, s"intro $run12 outro close end")).toDF("doc_id", "text")
    val got = graft.dedup.Decontam.contaminatedPairs(train, eval, 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 1L)), s"got $got")
  }

  test("decontamination train-df cap drops boilerplate grams and bounds join input (~linear)") {
    import spark.implicits._
    val boiler = (1 to 13).map(i => s"b$i").mkString(" ") // the hot gram
    val rare = (1 to 13).map(i => s"r$i").mkString(" ")
    def corpus(nHot: Int) = (
      ((1 to nHot).map(i => (i.toLong, s"doc$i $boiler")) :+
        (9000L, s"unique $rare")).toDF("doc_id", "text"),
      Seq((10000L, s"eval $boiler and $rare here")).toDF("doc_id", "text"))
    // semantics: with the cap below the hot gram's train df, only the rare
    // gram counts — the boilerplate footer alone cannot flag contamination
    val (train, eval) = corpus(50)
    val capped = graft.dedup.Decontam
      .contaminatedPairs(train, eval, 1L, maxTrainDf = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(capped == Set((10000L, 9000L, 1L)), s"got $capped")
    // and the uncapped default still sees the hot-gram pairs
    val uncapped = graft.dedup.Decontam.contaminatedPairs(train, eval, 1L)
    assert(uncapped.count() == 51L)
    // scale evidence: the fingerprint-join input is Σ_g min-capped df — it
    // must stay ~flat as the hot gram's train df grows 4×, while the
    // uncapped input grows linearly with it (at web scale: quadratically
    // in the pair fan-out). Measured through the same public primitives
    // the operator composes.
    def joinInputRows(nHot: Int, cap: Long): Long = {
      val (tr, ev) = corpus(nHot)
      val trFp = graft.dedup.Decontam.gramFingerprints(tr)
      val evG = graft.dedup.Decontam.gramFingerprints(ev).select("gh").distinct()
      val hits = trFp.join(evG, "gh")
      hits.join(
        hits.groupBy("gh").agg(count(lit(1)).as("tdf"))
          .filter(col("tdf") <= cap).select("gh"),
        Seq("gh"), "left_semi").count()
    }
    val small = joinInputRows(50, 10L)
    val big = joinInputRows(200, 10L)
    assert(small == big && small <= 2L,
      s"capped join input grew: $small -> $big")
    assert(joinInputRows(200, Long.MaxValue) >= 200L)
  }

  test("tf-idf top terms match a closed-form two-document corpus") {
    import spark.implicits._
    // doc 0: x x x y   doc 1: y z   (N=2; df: x=1, y=2, z=1)
    val docs = Seq((0L, "x x x y"), (1L, "y z")).toDF("doc_id", "text")
    val got = graft.quality.TfIdf.topTerms(spark, docs, 2)
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getAs[Double]("tfidf"))).toSet
    val ln2 = BigDecimal(3 * math.log(2.0)).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val ln1 = BigDecimal(math.log(2.0)).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    // y scores tf·ln(2/2)=0 in both docs; x: 3·ln2, z: 1·ln2
    assert(got == Set((0L, "x", ln2), (0L, "y", 0.0), (1L, "z", ln1), (1L, "y", 0.0)))
  }

  test("tf-idf broadcast gate: hint only under the measured-vocabulary limit, rows identical") {
    import spark.implicits._
    val docs = Seq((0L, "x x x y"), (1L, "y z")).toDF("doc_id", "text")
    def hasBroadcastHint(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }.nonEmpty
    val under = graft.quality.TfIdf.topTerms(spark, docs, 2)
    val over = graft.quality.TfIdf.topTerms(spark, docs, 2, maxBroadcastTerms = 0L)
    assert(hasBroadcastHint(under), "vocab under the gate must carry the hint")
    assert(!hasBroadcastHint(over), "vocab over the gate must NOT carry the hint")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1),
        r.getAs[Double]("tfidf"))).toSet
    assert(rows(under) == rows(over))
  }

  test("bucketed gram table: repeated decontamination joins with zero train-side exchange") {
    import spark.implicits._
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val shared = (1 to 13).map(i => s"w$i").mkString(" ")
    val train = Seq(
      (0L, s"$shared train tail tokens here"),
      (1L, "another train document " + (1 to 13).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val eval = Seq((100L, s"$shared eval tail goes here")).toDF("doc_id", "text")
    val grams = graft.dedup.Decontam.gramTable(spark, train,
      "graft_grams_optest", nBuckets = 4)
    // maxBroadcastGrams = 0 forces the shuffled semi-join regime — the
    // corpus-sized-eval fallback, exactly where the layout pays
    val fromTable = graft.dedup.Decontam.contaminatedPairsFromGrams(
      grams, eval, 1L, maxBroadcastGrams = 0L)
    val baseline = graft.dedup.Decontam.contaminatedPairs(
      train, eval, 1L, maxBroadcastGrams = 0L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows(fromTable) == Set((100L, 0L, 1L)))
    assert(rows(fromTable) == rows(baseline))
    // plan: the gram scan must reach its first join with NO Exchange in
    // between — an exchange whose subtree holds the bucketed scan but no
    // join node would be a train-leg shuffle (post-join exchanges contain
    // the join and are the eval-keyed aggregate, not a train re-shuffle)
    val plan = fromTable.queryExecution.sparkPlan
    assert(plan.toString.contains("Bucketed: true"),
      s"gram table scan must report its bucketing:\n$plan")
    val trainLegShuffles = plan.collect {
      case e: ShuffleExchangeExec
          if e.treeString.contains("graft_grams_optest") &&
            !e.treeString.contains("Join") => e
    }
    assert(trainLegShuffles.isEmpty,
      s"train grams re-exchanged despite bucketing:\n$plan")
  }

  test("near-dup cluster collapse: chained pairs one cluster, min-id wins; variants agree") {
    import spark.implicits._
    val base = Seq.fill(5)("alpha beta gamma delta epsilon zeta eta theta " +
      "iota kappa lambda mu").mkString(" ")
    val docs = Seq(
      (10L, s"$base one"),   // 10~11~12 chain: pairwise near-dups
      (11L, s"$base two"),
      (12L, s"$base three"),
      (30L, "totally different content about nothing similar at all here"),
      (31L, "yet another unrelated document body with fresh words only"))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val expected = Set(
      (10L, 10L, true), (11L, 10L, false), (12L, 10L, false),
      (30L, 30L, true), (31L, 31L, true))
    val fast = rows(graft.dedup.Dedup.clusters(spark, docs, 0.5))
    val portable = rows(graft.dedup.Dedup.clusters(spark, docs, 0.5,
      portableHash = true))
    assert(fast == expected)
    assert(portable == expected, "md5-portable path must find the same clusters")
    // filter(is_winner) IS the deduplicated corpus
    assert(graft.dedup.Dedup.clusters(spark, docs, 0.5)
      .filter(col("is_winner")).count() == 3)

    // quality-ranked winner: max score wins the cluster (tie → min doc_id)
    val scored = docs.withColumn("score", col("doc_id").cast("double"))
    val byScore = rows(graft.dedup.Dedup.clustersByScore(
      spark, scored, 0.5, "score"))
    assert(byScore == Set(
      (10L, 10L, false), (11L, 10L, false), (12L, 10L, true),
      (30L, 30L, true), (31L, 31L, true)))
  }

  test("line/span dedup: corpus-df flags planted boilerplate; cleanedText strips in order") {
    import spark.implicits._
    val boiler = "subscribe to our newsletter"
    val docs = Seq(
      (0L, s"unique zero content\n$boiler\nmore zero text"),
      (1L, s"$boiler\nunique one content"),
      (2L, "unique two content here"),
      (3L, s"another three unique\n$boiler"))
      .toDF("doc_id", "text")
    val flags = graft.dedup.Dedup.lineFlags(graft.dedup.Dedup.linesOf(docs), 2L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(3), r.getBoolean(4)))
    // the boilerplate line occurs in 3 distinct docs → df=3, keep=false;
    // every other line is unique → df=1, keep=true
    val boilerRows = flags.filter(_._3 == 3L)
    assert(boilerRows.map(t => (t._1, t._2)).toSet ==
      Set((0L, 1), (1L, 0), (3L, 1)))
    assert(boilerRows.forall(!_._4))
    assert(flags.filter(_._3 == 1L).forall(_._4))

    val cleaned = graft.dedup.Dedup.cleanedText(
        graft.dedup.Dedup.linesOf(docs), 2L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(cleaned(0L) == "unique zero content\nmore zero text") // order kept
    assert(cleaned(1L) == "unique one content")
    assert(cleaned(2L) == "unique two content here")
    assert(cleaned(3L) == "another three unique")

    // span unit: 7 tokens at w=3 → spans of 3/3/1, 0-indexed positions
    val spans = graft.dedup.Dedup.spansOf(
        Seq((9L, "t1 t2 t3 t4 t5 t6 t7")).toDF("doc_id", "text"), 3)
      .collect().map(r => (r.getInt(1), r.getString(2))).toSet
    assert(spans == Set((0, "t1 t2 t3"), (1, "t4 t5 t6"), (2, "t7")))
    // degenerate: empty / whitespace-only docs emit no lines or spans
    val empties = Seq((5L, ""), (6L, "   ")).toDF("doc_id", "text")
    assert(graft.dedup.Dedup.linesOf(empties).count() == 0)
    assert(graft.dedup.Dedup.spansOf(empties, 3).count() == 0)
  }
}
