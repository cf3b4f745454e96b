package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.util.hashing.MurmurHash3

/** Large-scale training-data deduplication operators over a document table.
  * All hashing is seeded and pure — reruns are byte-stable (north-rule
  * determinism). Exact dedup is a hash-groupBy; near-dup detection is
  * MinHash + LSH banding (shingle → minhash → band → bucket self-join),
  * which keeps the candidate set linear-ish instead of the O(n²) all-pairs
  * scan a naive Jaccard would need at 100 TB.
  */
object Dedup {

  /** Exact duplicate groups by content hash: one row per distinct text with
    * the group size and representative (min) doc id. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("text_md5"))
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("rep_doc_id"))

  // --- MinHash ---------------------------------------------------------

  val NumHashes = 64
  val Bands = 16 // 16 bands x 4 rows
  val RowsPerBand: Int = NumHashes / Bands
  /** Per-bucket pair-generation cap (see note in [[minhashPairs]]). */
  val MaxBucketSize = 1000
  private val Prime = 2147483647L // 2^31 - 1

  /** Deterministic (a, b) coefficients for the k universal hash functions,
    * drawn from a fixed-seed PRNG. */
  private lazy val coeffs: Array[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Array.fill(NumHashes)((1L + rnd.nextInt(Int.MaxValue - 1).toLong,
      rnd.nextInt(Int.MaxValue).toLong))
  }

  /** Word 2-shingle hash set of a text (MurmurHash3 — pure Scala,
    * JVM-stable). */
  def shingles(text: String): Set[Int] = {
    val toks = graft.text.PyStr.split(text)
    if (toks.length < 2) toks.map(MurmurHash3.stringHash(_, 42)).toSet
    else toks.sliding(2).map(w => MurmurHash3.stringHash(w.mkString(" "), 42)).toSet
  }

  /** MinHash signature (length [[NumHashes]]) of a shingle set. */
  def signature(sh: Set[Int]): Array[Long] = {
    val sig = Array.fill(NumHashes)(Long.MaxValue)
    sh.foreach { s =>
      val x = (s.toLong & 0xffffffffL)
      var i = 0
      while (i < NumHashes) {
        val (a, b) = coeffs(i)
        val h = (a * x + b) % Prime
        if (h < sig(i)) sig(i) = h
        i += 1
      }
    }
    sig
  }

  /** Candidate near-duplicate pairs via LSH banding: docs whose signatures
    * agree on all rows of at least one band meet in a bucket; pairs are then
    * scored by signature agreement (estimated Jaccard) and filtered.
    * Output: (doc_a, doc_b, est_jaccard) with doc_a < doc_b, distinct.
    *
    * Scale shape: one narrow map to (band, bucket) keys, one shuffle on the
    * bucket key, pair fan-out only within buckets. Hot buckets are bounded
    * by the banding probability, not by data volume.
    */
  def minhashPairs(spark: SparkSession, docs: DataFrame, minJaccard: Double): DataFrame =
    minhashPairs(spark, docs, minJaccard,
      spark.sparkContext.longAccumulator("minhash.truncatedBuckets"))

  /** As [[minhashPairs]], with the bucket-truncation cap made observable:
    * `truncatedBuckets` counts every (band, bucket) whose membership exceeded
    * [[MaxBucketSize]] and was cut — no silent caps (read it after an action
    * on the result; a nonzero value means run [[exact]] first or raise the
    * cap). The count is incremented inside a transformation, so Spark's
    * accumulator guarantee is AT-LEAST-ONCE here (task retries, speculation,
    * or a second action can over-count): treat it as an upper bound whose
    * only load-bearing reading is zero-vs-nonzero — zero is exact (no retry
    * can invent an increment), nonzero means truncation really occurred at
    * least once and the run needs investigating. */
  def minhashPairs(spark: SparkSession, docs: DataFrame, minJaccard: Double,
      truncatedBuckets: org.apache.spark.util.LongAccumulator): DataFrame = {
    import spark.implicits._
    val sigs = docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val sh = shingles(text)
        // empty shingle set (empty/whitespace-only doc) ⇒ no signature: an
        // all-MaxValue sentinel signature would make every pair of empty
        // docs a "near-duplicate" — empty docs are [[exact]]'s job
        if (sh.isEmpty) None else Some((id, signature(sh)))
      }
      .toDF("doc_id", "sig")
    pairsFromSigs(spark, sigs, minJaccard, truncatedBuckets)
  }

  // --- DuckDB-portable (md5-based) variants ------------------------------
  //
  // The murmur/xxhash fast path above is JVM-only, so its exact outputs
  // cannot be replayed by an external SQL oracle. These variants swap ONLY
  // the primitive hash for md5 (computable bit-identically in DuckDB as
  // ('0x' || substr(md5(s),1,8))::BIGINT) — shingling, signatures, banding,
  // pairing, and estimation are the same code paths, so an oracle match on
  // the md5 variant pins the whole LSH pipeline. md5 costs ~3× murmur per
  // token; at 100 TB run the fast path and keep this one for verification.

  /** First 4 bytes of MD5 as an unsigned 32-bit value. */
  def md5Hash32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Lower 8 MD5 bytes, little-endian — DuckDB's `md5_number_lower`. */
  def md5Hash64(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.ByteBuffer.wrap(d, 8, 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
  }

  /** Word 2-shingle strings (pre-hash) — shared by both hash variants. */
  def shingleStrings(text: String): Set[String] = {
    val toks = graft.text.PyStr.split(text)
    if (toks.length < 2) toks.toSet
    else toks.sliding(2).map(_.mkString(" ")).toSet
  }

  /** MinHash signature over md5-hashed shingles. The operand is reduced
    * mod P BEFORE the multiply so the arithmetic stays in signed-64 range
    * on both engines (a < 2³¹, x mod P < 2³¹ ⇒ a·x < 2⁶²). */
  def signatureMd5(shingleSet: Set[String]): Array[Long] = {
    val sig = Array.fill(NumHashes)(Long.MaxValue)
    shingleSet.foreach { s =>
      val x = md5Hash32(s) % Prime
      var i = 0
      while (i < NumHashes) {
        val (a, b) = coeffs(i)
        val h = (a * x + b) % Prime
        if (h < sig(i)) sig(i) = h
        i += 1
      }
    }
    sig
  }

  /** The universal-hash coefficients as SQL VALUES `(i, a, b)` — emitted
    * from the engine's own PRNG so the oracle can never drift. */
  def coeffsValues: String =
    coeffs.zipWithIndex.map { case ((a, b), i) => s"($i, $a, $b)" }
      .mkString("(VALUES ", ", ", ")")

  /** [[minhashPairs]] with the portable md5 primitive. */
  /** The signature row function as ONE STABLE instance: Dataset plans
    * embed typed-closure objects and the CacheManager compares them by
    * reference, so a fresh lambda per call would make two invocations'
    * persisted signature tables canonicalize UNEQUAL — q117 would re-pay
    * q61's whole signature computation instead of reading its session
    * cache (the q53/q88 shared-plan lesson applied to typed closures). */
  private val sigRowMd5: ((Long, String)) => Option[(Long, Array[Long])] = {
    case (id, text) =>
      val sh = shingleStrings(text)
      if (sh.isEmpty) None else Some((id, signatureMd5(sh)))
  }

  /** [[sigRowMd5]] in partition-iterator form — `Dataset.flatMap` would
    * wrap the row function in a FRESH lambda per call, defeating the
    * reference-equality the cache match needs; `mapPartitions` stores
    * this exact instance in the plan node. */
  private val sigPartMd5
      : Iterator[(Long, String)] => Iterator[(Long, Array[Long])] =
    _.flatMap(sigRowMd5(_))

  def minhashPairsMd5(spark: SparkSession, docs: DataFrame, minJaccard: Double): DataFrame = {
    import spark.implicits._
    val sigs = docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions(sigPartMd5)
      .toDF("doc_id", "sig")
    pairsFromSigs(spark, sigs, minJaccard,
      spark.sparkContext.longAccumulator("minhash.truncatedBuckets"))
  }

  /** Banding + in-bucket pairing + agreement estimation, shared by both
    * hash variants. The bucket key is the band's literal values (not a hash
    * of them): no arrayHash collisions, and an external oracle can build
    * the identical key.
    *
    * Shuffle shape: the banding exchange carries ONLY `(band, bucket,
    * doc_id)` — the former design shipped the full 64-long signature once
    * per band (~16× signature amplification, the dominant shuffle payload
    * at corpus scale). Candidate pairs (already distinct and band-free)
    * then join back against the signature table for the agreement
    * estimate; that table is persisted because it feeds both the banding
    * scan and the join-back, and at ~0.5 KB/doc it is a rounding error
    * next to the corpus it summarizes. The cache entry lives until session
    * end (CacheManager dedups identical plans, so re-running the same
    * corpus shares one copy); a long-lived session sweeping many DISTINCT
    * corpora should `spark.catalog.clearCache()` between them. */
  private def pairsFromSigs(spark: SparkSession, sigs: DataFrame,
      minJaccard: Double,
      truncatedBuckets: org.apache.spark.util.LongAccumulator): DataFrame = {
    import spark.implicits._
    val sigsP = sigs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val banded = sigsP.as[(Long, Array[Long])].flatMap { case (id, sig) =>
      (0 until Bands).map { b =>
        (b, sig.slice(b * RowsPerBand, (b + 1) * RowsPerBand).mkString(","), id)
      }
    }.toDF("band", "bucket", "doc_id")

    // Pair fan-out within a bucket is quadratic — for degenerate corpora
    // (mass-identical docs) a bucket could hold the whole table. Exact
    // duplicates belong to [[exact]] (run it first); buckets above the cap
    // are truncated to the first `MaxBucketSize` members by doc_id so the
    // job stays bounded. The cap is observable, not silent: every truncated
    // bucket increments the `truncatedBuckets` accumulator (at-least-once —
    // see the [[minhashPairs]] overload's scaladoc).
    val cand = banded
      .groupBy("band", "bucket")
      .agg(collect_list(col("doc_id")).as("members"))
      .filter(size(col("members")) > 1)
      .as[(Int, String, Seq[Long])]
      .flatMap { case (_, _, members) =>
        if (members.size > MaxBucketSize) truncatedBuckets.add(1L)
        val sorted = members.sorted.take(MaxBucketSize)
        for {
          i <- sorted.indices
          j <- (i + 1) until sorted.length
        } yield (sorted(i), sorted(j))
      }
      .toDF("doc_a", "doc_b")
      .distinct()

    cand
      .join(sigsP.toDF("doc_a", "sig_a"), "doc_a")
      .join(sigsP.toDF("doc_b", "sig_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("sig_a"), col("sig_b"))
      .as[(Long, Long, Array[Long], Array[Long])]
      .map { case (a, b, siga, sigb) =>
        val agree = siga.zip(sigb).count { case (x, y) => x == y }
        (a, b, agree.toDouble / NumHashes)
      }
      .toDF("doc_a", "doc_b", "est_jaccard")
      .filter(col("est_jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"),
        round(col("est_jaccard"), 4).as("est_jaccard"))
  }

  // --- line/span-level corpus dedup (C4/RefinedWeb hygiene) --------------
  //
  // Document-level dedup ([[exact]]/[[clusters]]) cannot remove the
  // boilerplate that repeats ACROSS distinct documents — navigation chrome,
  // cookie banners, licence footers. The standard web-corpus hygiene step
  // (C4's three-sentence-span dedup, RefinedWeb's line dedup) explodes
  // documents into lines, counts each line's corpus-wide document
  // frequency, and strips lines above a df threshold. Two "line" units:
  // real newline lines ([[linesOf]]) for corpora with line structure, and
  // fixed W-token spans ([[spansOf]]) — the C4-style unit — for flowing
  // text without it.

  /** `(doc_id, line_idx, ln)` — trimmed, non-empty newline-separated lines
    * of each document, with their 0-based position. Narrow (one explode,
    * no shuffle). */
  def linesOf(docs: DataFrame, sepRegex: String = "\n+"): DataFrame =
    docs.select(col("doc_id").cast("long"),
        posexplode(split(col("text"), sepRegex)).as(Seq("line_idx", "ln")))
      .select(col("doc_id"), col("line_idx"), trim(col("ln")).as("ln"))
      .filter(col("ln") =!= "")

  /** `(doc_id, line_idx, ln)` — consecutive `w`-token spans (the last span
    * may be shorter). The token array is PROJECTED before the transform so
    * the tokenizer runs once per row, not once per span (the
    * [[Decontam.gramFingerprints]] lambda-re-evaluation lesson). */
  def spansOf(docs: DataFrame, w: Int): DataFrame = {
    require(w >= 1, s"span width must be >= 1, got $w")
    val toked = docs.select(col("doc_id").cast("long"),
      split(trim(col("text")), "\\s+").as("t"))
    val n = ceil(size(col("t")).cast("double") / w).cast("int")
    val spans = transform(sequence(lit(0), n - 1),
      j => array_join(slice(col("t"), j * w + 1, lit(w)), " "))
    toked.select(col("doc_id"), posexplode(spans).as(Seq("line_idx", "ln")))
      .filter(col("ln") =!= "")
  }

  /** Corpus-wide line-df keep flags: `(doc_id, line_idx, fp, line_df,
    * keep)` where `fp = md5(line)`, `line_df` counts DISTINCT documents
    * containing the line, and `keep = line_df <= maxDf` (a line repeated
    * across more than `maxDf` documents is boilerplate). Scale shape: one
    * fp-keyed shuffle for the df aggregate (two-phase, partial map-side
    * distinct) and one fp-keyed join back; the line stream is scanned
    * twice rather than persisted — at corpus scale the recompute (narrow
    * explode) is cheaper than caching every line. */
  def lineFlags(lines: DataFrame, maxDf: Long): DataFrame = {
    val fp = lines.select(col("doc_id"), col("line_idx"),
      md5(col("ln")).as("fp"))
    val dfc = fp.groupBy("fp")
      .agg(countDistinct(col("doc_id")).as("line_df"))
    fp.join(dfc, "fp")
      .select(col("doc_id"), col("line_idx"), col("fp"), col("line_df"),
        (col("line_df") <= maxDf).as("keep"))
  }

  /** Rebuild each document's text from the lines that survive the df
    * threshold, in original order — the "strip" half of line dedup.
    * One doc_id-keyed aggregation on top of [[lineFlags]]' shape. */
  def cleanedText(lines: DataFrame, maxDf: Long, sep: String = "\n"): DataFrame = {
    val dfc = lines.select(md5(col("ln")).as("fp"), col("doc_id"))
      .groupBy("fp").agg(countDistinct(col("doc_id")).as("line_df"))
    lines.withColumn("fp", md5(col("ln")))
      .join(dfc, "fp")
      .filter(col("line_df") <= maxDf)
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("line_idx"), col("ln")))).as("ls"))
      .select(col("doc_id"),
        array_join(transform(col("ls"), s => s.getField("ln")), sep).as("text"))
  }

  /** 64-bit SimHash fingerprint per document (sign of per-bit weighted sums
    * over token hashes). */
  def simhash(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val counts = graft.text.PyStr.split(text).groupBy(identity).view.mapValues(_.length)
        val acc = new Array[Long](64)
        counts.foreach { case (tok, n) =>
          val h64 = (MurmurHash3.stringHash(tok, 1).toLong << 32) |
            (MurmurHash3.stringHash(tok, 2).toLong & 0xffffffffL)
          var b = 0
          while (b < 64) {
            if (((h64 >>> b) & 1L) == 1L) acc(b) += n else acc(b) -= n
            b += 1
          }
        }
        var fp = 0L
        var b = 0
        while (b < 64) { if (acc(b) > 0) fp |= (1L << b); b += 1 }
        (id, fp)
      }
      .toDF("doc_id", "simhash")
  }

  /** Portable SimHash: md5-based 64-bit token hash ([[md5Hash64]] ==
    * DuckDB `md5_number_lower`), fingerprint emitted as a 64-char '0'/'1'
    * string (MSB first) — a bit-63 fingerprint would overflow a signed
    * SQL BIGINT, the string sidesteps it on both engines. */
  def simhashBits(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val counts = graft.text.PyStr.split(text).groupBy(identity).view.mapValues(_.length)
        val acc = new Array[Long](64)
        counts.foreach { case (tok, n) =>
          val h64 = md5Hash64(tok)
          var b = 0
          while (b < 64) {
            if (((h64 >>> b) & 1L) == 1L) acc(b) += n else acc(b) -= n
            b += 1
          }
        }
        val sb = new StringBuilder(64)
        var b = 63
        while (b >= 0) { sb.append(if (acc(b) > 0) '1' else '0'); b -= 1 }
        (id, sb.toString)
      }
      .toDF("doc_id", "simhash_bits")
  }

  /** Near-duplicate CLUSTER COLLAPSE — the composition that turns pair
    * detection into deletion, and what production corpus dedup (the MinHash
    * protocols above) actually ships: candidate pairs are edges of a
    * similarity graph, its connected components are the duplicate clusters,
    * and exactly one member per cluster survives. Winner rule: the MINIMUM
    * doc_id of the cluster (deterministic, slice-stable — any rerun or
    * backfill re-derives the same winner; see [[clustersByScore]] for a
    * quality-ranked winner).
    *
    * Output: `(doc_id, cluster_id, is_winner)` for EVERY input doc —
    * singletons (docs in no near-dup pair) are their own cluster and
    * winner, so `filter(is_winner)` IS the deduplicated corpus.
    *
    * Scale shape: [[minhashPairs]]'s banding exchange + the O(log²)-round
    * [[graft.kg.ConnectedComponents.runStar]] over the PAIR graph — which
    * is pair-count-sized (near-dup pairs are a small fraction of the
    * corpus), not corpus-sized; the corpus itself is touched by one narrow
    * signature scan and one final left join keyed by doc_id.
    *
    * @param portableHash use the md5 primitive ([[minhashPairsMd5]]) so an
    *        external SQL oracle can replay the whole composition; the
    *        murmur fast path is ~3× cheaper per token and is what a 100 TB
    *        run uses. */
  def clusters(spark: SparkSession, docs: DataFrame, minJaccard: Double,
      portableHash: Boolean = false): DataFrame = {
    val pairs =
      (if (portableHash) minhashPairsMd5(spark, docs, minJaccard)
       else minhashPairs(spark, docs, minJaccard))
        .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val comp = graft.kg.ConnectedComponents.runStar(spark, pairs)
      .withColumnRenamed("node", "doc_id")
    docs.select(col("doc_id").cast("long"))
      .join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("cluster_id"))
      .withColumn("is_winner", col("doc_id") === col("cluster_id"))
  }

  /** [[clusters]] with a QUALITY-RANKED winner: per cluster, the doc with
    * the maximum `score` column wins (ties broken by min doc_id) — the rule
    * a production pipeline uses when duplicates differ in extraction
    * quality (keep the longest / cleanest copy, per the
    * [[graft.quality.TextQuality]] signals). One extra window shuffle
    * keyed by cluster_id, which is pair-graph-sized per cluster. `docs`
    * must carry `doc_id`, `text`, and the score column. */
  def clustersByScore(spark: SparkSession, docs: DataFrame, minJaccard: Double,
      scoreCol: String, portableHash: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = clusters(spark, docs, minJaccard, portableHash)
    val w = Window.partitionBy("cluster_id")
      .orderBy(desc(scoreCol), asc("doc_id"))
    base
      .join(docs.select(col("doc_id").cast("long"), col(scoreCol)), "doc_id")
      .withColumn("rn", row_number().over(w))
      .withColumn("is_winner", col("rn") === 1)
      .select("doc_id", "cluster_id", "is_winner")
  }

  // --- incremental (delta) dedup against a landed corpus -----------------

  /** Classify each batch document against an already-landed corpus — the
    * continuous-crawl shape, where every new crawl segment must be checked
    * against the landed corpus WITHOUT rescanning or reshuffling it:
    * `exact_dup` (byte-identical text), `near_dup` (LSH est-Jaccard ≥
    * `minJaccard` with some corpus doc), else `new`; `dup_of` is the min
    * corpus doc_id responsible (null for `new`), exact beating near.
    *
    * Scale shape: exact status is an fp-keyed left join — land the corpus
    * fingerprints as a `bucketBy(fp)` table (the
    * [[graft.sources.BucketedTables]] layout) and the corpus side
    * exchanges ZERO bytes on every subsequent batch. Near status reuses
    * the [[pairsFromSigs]] banding discipline cross-sided: both banding
    * exchanges carry only `(band, bucket, doc_id)`, candidates join back
    * to the persisted signature tables, and in production the corpus
    * band/signature tables are written once and reused per batch — the
    * recurring cost is O(batch), not O(corpus). Uses the md5-portable
    * primitive so an external SQL oracle replays the whole classification;
    * swap [[shingles]]/[[signature]] in for the ~3× cheaper murmur path at
    * 100 TB. */
  def deltaMd5(spark: SparkSession, corpus: DataFrame, batch: DataFrame,
      minJaccard: Double): DataFrame = {
    import spark.implicits._
    val corpusFp = corpus.groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id").cast("long")).as("exact_of"))
    val exact = batch.select(col("doc_id").cast("long").as("doc_id"),
        md5(col("text")).as("fp"))
      .join(corpusFp, Seq("fp"), "left")
      .select(col("doc_id"), col("exact_of"))

    def sigsMd5(docs: DataFrame): DataFrame =
      docs.select(col("doc_id").cast("long"), col("text"))
        .as[(Long, String)]
        .flatMap { case (id, text) =>
          val sh = shingleStrings(text)
          if (sh.isEmpty) None else Some((id, signatureMd5(sh)))
        }.toDF("doc_id", "sig")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def bandsOf(sigs: DataFrame, idCol: String): DataFrame =
      sigs.as[(Long, Array[Long])].flatMap { case (id, sig) =>
        (0 until Bands).map { b =>
          (b, sig.slice(b * RowsPerBand, (b + 1) * RowsPerBand).mkString(","), id)
        }
      }.toDF("band", "bucket", idCol)

    val corpusSigs = sigsMd5(corpus)
    val batchSigs = sigsMd5(batch)
    val cand = bandsOf(batchSigs, "batch_doc")
      .join(bandsOf(corpusSigs, "corpus_doc"), Seq("band", "bucket"))
      .select(col("batch_doc"), col("corpus_doc")).distinct()
    val near = cand
      .join(batchSigs.toDF("batch_doc", "sig_b"), "batch_doc")
      .join(corpusSigs.toDF("corpus_doc", "sig_c"), "corpus_doc")
      .select(col("batch_doc"), col("corpus_doc"), col("sig_b"), col("sig_c"))
      .as[(Long, Long, Array[Long], Array[Long])]
      .map { case (b, c, sb, sc) =>
        (b, c, sb.zip(sc).count { case (x, y) => x == y }.toDouble / NumHashes)
      }.toDF("batch_doc", "corpus_doc", "e")
      .filter(col("e") >= minJaccard)
      .groupBy(col("batch_doc").as("doc_id"))
      .agg(min("corpus_doc").as("near_of"))

    exact.join(near, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("exact_of").isNotNull, "exact_dup")
          .when(col("near_of").isNotNull, "near_dup")
          .otherwise("new").as("status"),
        coalesce(col("exact_of"), col("near_of")).as("dup_of"))
  }

  /** Asymmetric shingle CONTAINMENT pairs — the near-dup measure Jaccard
    * misses: a short document wholly quoted inside a long one has
    * `|A∩B|/|A| ≈ 1` but tiny Jaccard, so MinHash-LSH candidate
    * generation (tuned to Jaccard) never proposes the pair (Broder '97
    * separates resemblance from containment for exactly this reason).
    * Candidates therefore come from a direct shingle-posting self-join,
    * NOT from q15's LSH: pairs sharing any surviving shingle are scored
    * `ov_a = shared/|A|`, `ov_b = shared/|B|`, keep `max ≥ minOverlap`.
    *
    * Scale shape: the posting join's fan-out is Σ df² over shingles —
    * the curse-of-the-last-reducer lives in STOP SHINGLES (boilerplate
    * n-grams in a large fraction of the corpus), so shingles in more
    * than `dfCapPercent`% of documents are dropped before the join (the
    * classic stop-shingle rule; the same df-cap move as
    * [[graft.dedup.Decontam]]'s boilerplate grams). The cap is
    * DATA-RELATIVE — a corpus-size percentage in integer arithmetic
    * (`n·pct div 100`, exact in both engines) — so the bound tracks the
    * corpus at any scale factor. Shingles are the same word bigrams as
    * q31's verify stage, built with codegen'd array expressions (no UDF).
    *
    * Two physical plans produce these rows; which is cheaper depends on
    * the corpus's df profile, so [[containmentPairsAdaptive]] picks from
    * MEASURED stats (the same measured-scalar gating as
    * [[graft.quality.TfIdf.topTerms]]' broadcast decision):
    *
    *  - this DIRECT posting self-join: cost `Σ df²`, optimal when
    *    sharing pairs are near-dups (their shared-shingle enumeration
    *    IS the useful work) or the capped df profile is flat-and-low;
    *  - [[containmentPairsPrefix]]: optimal when `Σ df²` is driven by
    *    junk mid-df shingles whose pairs never qualify — the prefix
    *    filter deletes those pairs before any pairwise work.
    *
    * @return `(doc_a, doc_b, n_shared, n_a, n_b, ov_a, ov_b)`,
    *         overlaps rounded to 4 decimals. */
  def containmentPairs(docs: DataFrame, dfCapPercent: Long,
      minOverlap: Double): DataFrame = {
    val rare = containmentPostings(docs, dfCapPercent)
    directContainment(rare, containmentSizes(rare), minOverlap)
  }

  /** [[containmentPairs]] with POSITIONAL PREFIX FILTERING — the ppjoin
    * prefix principle (Xiao et al., WWW'08) adapted to the asymmetric
    * max-containment score. IDENTICAL output (same oracle), different
    * candidate generation:
    *
    * Under a fixed global rarity order on shingles (df ascending, then
    * the shingle string), if `|A∩B| ≥ k` then among A's first
    * `|A|−k+1` shingles at least one lies in `A∩B` — at most `|A|−k`
    * of A's shingles are outside B, so they cannot fill the whole
    * prefix. A qualifying pair has `round(sh/n_x, 4) ≥ t` on some side
    * x, i.e. `sh ≥ (t − 5e-5)·n_x` (HALF_UP rounding made exact), so
    * with `k(n) = max(1, ⌈(t − 5e-5)·n⌉)` the qualifying side's
    * `n−k(n)+1`-prefix must intersect the OTHER side's full shingle
    * set. Joining every doc's prefix postings against every doc's full
    * postings therefore proposes every qualifying pair — candidate-
    * COMPLETE — and an exact join-back verify restores `n_shared`, so
    * false candidates are filtered, never mis-scored.
    *
    * Scale shape: the quadratic fan-out drops from `Σ df_full²` to
    * `Σ df_prefix·df_full`, and because the prefix keeps each doc's
    * RAREST shingles, a junk mid-df shingle enters a doc's prefix only
    * when the doc has almost nothing rarer — its `df²` pair fan-out
    * vanishes from the candidate join. Costs added: one rank shuffle
    * (row_number windowed by doc, keyed the same as the sizes agg) and
    * the per-candidate verify join-back (`Σ_cand (n_a + n_b)`), which
    * is why this plan LOSES when candidates ≈ all sharing pairs (dense
    * low-cardinality vocabularies — measured 55 s vs the direct join's
    * 36 s on the sf0.1 synthetic corpus, same host window): the verify
    * then re-enumerates what the direct join enumerates once. Use
    * [[containmentPairsAdaptive]] unless the regime is known. The
    * posting table is persisted once and feeds the rank, the probe
    * side, and both verify legs. */
  def containmentPairsPrefix(docs: DataFrame, dfCapPercent: Long,
      minOverlap: Double): DataFrame = {
    val rare = containmentPostings(docs, dfCapPercent)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = containmentSizes(rare)
    val prefix = prefixPostings(rare, sizes, minOverlap)
    prefixContainment(rare, prefix, sizes, minOverlap)
  }

  /** [[containmentPairs]] with the physical plan chosen from MEASURED
    * stats — identical rows from either branch, so the choice never
    * shows in results, only in cost. Model (exact integer counters off
    * the persisted posting table, no sampling):
    *
    *  - `Σ df²` — the direct self-join's fan-out — is `sum(df)` over
    *    posting ROWS (each of a shingle's df rows carries df once).
    *  - If `Σ df² ≤ directCheapFactor · |postings|` the direct join is
    *    within a small constant of linear: take it without paying the
    *    rank pass (the power-law-tail regime — post-cap dfs near 1).
    *  - Otherwise rank, build the prefix postings, and measure the
    *    candidate join's exact fan-out `Σ df_prefix·df_full` =
    *    `sum(df)` over PREFIX rows; model the verify join-back as
    *    `min(candRows, maxPairs) · 2·avg(n)` (candRows bounds the
    *    distinct candidate pairs — conservative toward direct, which
    *    is the bias you want since prefix adds two extra shuffles).
    *
    * Dense regime (sf0.1 synthetic: Σdf² = 72M but candidates ≈ ALL
    * 12.5M pairs → verify ≈ 1.3B) picks direct; the junk-mid-df-shingle
    * regime (a few df≈10k boilerplate shingles under the cap drive Σdf²
    * into the hundreds of millions while typical docs' prefixes stay
    * near-unique → candRows tiny) picks prefix. */
  def containmentPairsAdaptive(docs: DataFrame, dfCapPercent: Long,
      minOverlap: Double, directCheapFactor: Double = 8.0): DataFrame = {
    val rare = containmentPostings(docs, dfCapPercent)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = containmentSizes(rare)
    val head = rare.agg(count(lit(1)), sum(col("df"))).head()
    val posts = head.getLong(0)
    val sumDf2 = if (head.isNullAt(1)) 0L else head.getLong(1)
    if (sumDf2 <= directCheapFactor * posts)
      directContainment(rare, sizes, minOverlap)
    else {
      val nDocs = rare.select("doc_id").distinct().count()
      val prefix = prefixPostings(rare, sizes, minOverlap)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val candRows = Option(prefix.agg(sum(col("df"))).head().get(0))
        .fold(0L)(_.asInstanceOf[Long])
      if (preferDirectContainment(sumDf2, candRows,
          nDocs * (nDocs - 1) / 2, posts.toDouble / math.max(nDocs, 1)))
        directContainment(rare, sizes, minOverlap)
      else prefixContainment(rare, prefix, sizes, minOverlap)
    }
  }

  /** The adaptive cost model, exposed pure so both regimes are
    * unit-testable without building the corpora that exhibit them:
    * direct costs its fan-out `Σ df²`; prefix costs its candidate join
    * plus an exact verify of at most `min(candRows, maxPairs)` pairs at
    * `2·avgPostingsPerDoc` rows each. */
  def preferDirectContainment(sumDf2: Long, candRows: Long, maxPairs: Long,
      avgPostingsPerDoc: Double): Boolean =
    sumDf2.toDouble <=
      candRows.toDouble +
        math.min(candRows, maxPairs).toDouble * 2.0 * avgPostingsPerDoc

  /** Prefix postings `(doc_id, g, df)` under the global rarity order
    * (df asc, shingle asc): each doc's first `n − k(n) + 1` shingles,
    * `k(n) = max(1, ⌈(minOverlap − 5e-5)·n⌉)` — the smallest shared
    * count a qualifying side of size n can have (HALF_UP rounding made
    * exact). The 1e-9 guards ⌈⌉ against the product landing a double
    * ulp above an exact integer (under-k only lengthens the prefix —
    * still candidate-complete). */
  private def prefixPostings(rare: DataFrame, sizes: DataFrame,
      minOverlap: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val kOf = greatest(lit(1L),
      ceil(lit(minOverlap - 5e-5) * col("n") - lit(1e-9)))
    rare
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("df"), col("g"))))
      .join(sizes, "doc_id")
      .filter(col("rk") <= col("n") - kOf + 1)
      .select("doc_id", "g", "df")
  }

  private def directContainment(rare: DataFrame, sizes: DataFrame,
      minOverlap: Double): DataFrame = {
    // Pair enumeration via per-shingle sorted doc arrays + posexplode/
    // slice (identical (doc_a < doc_b, n_shared) rows as the former
    // posting self-join — each shingle contributes each ordered doc pair
    // exactly once either way). Two wins over the equi-join (measured
    // 20.6 s → ~6 s at sf0.1, OPTIMIZATION_r06): no join at all for the
    // Σ df² fan-out, and — decisive — the vocabulary-sized array frame is
    // ROUND-ROBIN REPARTITIONED before the explode, so the quadratic
    // enumeration work of the hottest shingles (df up to the stop cap)
    // spreads over every core. Under the join plan the same work sat on
    // the few post-shuffle partitions the ~10³ capped shingles hash into
    // — a rows-PRODUCED skew that AQE, which only sees rows read, cannot
    // split (guide §2.5).
    val shufflePartitions =
      rare.sparkSession.sessionState.conf.numShufflePartitions
    val glists = rare.groupBy("g")
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .select("ds")
      .repartition(shufflePartitions)
    val pairs = glists
      .select(posexplode(col("ds")).as(Seq("i", "da")), col("ds"))
      // slice is 1-based: docs strictly after position i (0-based da)
      .select(col("da").as("doc_a"),
        explode(slice(col("ds"), col("i") + 2, size(col("ds")))).as("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_shared"))
    scoreContainment(pairs, sizes, minOverlap)
  }

  private def prefixContainment(rare: DataFrame, prefix: DataFrame,
      sizes: DataFrame, minOverlap: Double): DataFrame = {
    // prefix(X) ⋈ full(Y): canonicalizing covers both directions, so
    // whichever side qualifies, its prefix witness proposes the pair
    val cand = prefix.select("doc_id", "g").as("a")
      .join(rare.select("doc_id", "g").as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
      .distinct()
    val pairs = cand // exact verify: full shared count per candidate
      .join(rare.select(col("doc_id").as("doc_a"), col("g")), "doc_a")
      .join(rare.select(col("doc_id").as("doc_b"), col("g")),
        Seq("doc_b", "g"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_shared"))
    scoreContainment(pairs, sizes, minOverlap)
  }

  /** Stop-shingle-capped bigram postings `(doc_id, g, df)` — the shared
    * candidate space of both containment variants. Shingles are the same
    * word bigrams as q31's verify stage, built with codegen'd array
    * expressions (no UDF); the df cap is integer-exact (`n·pct div 100`)
    * so it replays identically in the oracle. */
  private def containmentPostings(docs: DataFrame,
      dfCapPercent: Long): DataFrame = {
    val grams = when(size(col("tk")) < 2, col("tk")).otherwise(expr(
      """transform(sequence(1, size(tk) - 1),
        |  i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1)))"""
        .stripMargin.replaceAll("\n", " ")))
    val sh = docs
      .select(col("doc_id").cast("long").as("doc_id"),
        split(trim(col("text")), "\\s+").as("tk"))
      .select(col("doc_id"), explode(array_distinct(grams)).as("g"))
      .filter(col("g") =!= "")
    val nDocs = docs.count() // measured scalar, like q68's total
    val cap = nDocs * dfCapPercent / 100
    sh.join(
      sh.groupBy("g").agg(count(lit(1)).as("df")).filter(col("df") <= cap),
      "g")
  }

  /** Per-doc shingle-set sizes over the POST-cap space: numerator and
    * denominator must live in the same universe, or a boilerplate-heavy
    * document's true containment deflates (its stop-shingles would count
    * in |B| but never in |A∩B|) and the quote the operator exists to
    * catch slips under the threshold. */
  private def containmentSizes(rare: DataFrame): DataFrame =
    rare.groupBy("doc_id").agg(count(lit(1)).as("n"))

  private def scoreContainment(pairs: DataFrame, sizes: DataFrame,
      minOverlap: Double): DataFrame =
    pairs
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("n_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("n_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("n_shared"), col("n_a"), col("n_b"),
        round(col("n_shared") / col("n_a"), 4).as("ov_a"),
        round(col("n_shared") / col("n_b"), 4).as("ov_b"))
      .filter(greatest(col("ov_a"), col("ov_b")) >= minOverlap)

  /** [[containmentPairs]] as SQL (the q31 shingle CTE + the same
    * integer-exact df cap and rounded-overlap filter). */
  def containmentOracleSql(dfCapPercent: Long, minOverlap: Double): String =
    s"""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
       |  FROM documents),
       | sh AS (SELECT doc_id, g FROM (
       |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(tk) < 2 THEN tk
       |   ELSE list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1]) END)) AS g
       |  FROM toks) WHERE g <> ''),
       | cap AS (SELECT (count(*) * $dfCapPercent) // 100 AS c FROM documents),
       | rare AS (SELECT sh.doc_id, sh.g FROM sh
       |   JOIN (SELECT g FROM sh GROUP BY g
       |         HAVING count(*) <= (SELECT c FROM cap)) d ON d.g = sh.g),
       | sizes AS (SELECT doc_id, count(*) AS n FROM rare GROUP BY 1),
       | pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    count(*) AS n_shared
       |  FROM rare a JOIN rare b ON a.g = b.g AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       | SELECT doc_a, doc_b, n_shared, sa.n AS n_a, sb.n AS n_b,
       |  round(n_shared::double / sa.n, 4) AS ov_a,
       |  round(n_shared::double / sb.n, 4) AS ov_b
       | FROM pairs JOIN sizes sa ON doc_a = sa.doc_id
       | JOIN sizes sb ON doc_b = sb.doc_id
       | WHERE greatest(round(n_shared::double / sa.n, 4),
       |   round(n_shared::double / sb.n, 4)) >= $minOverlap"""
      .stripMargin.replaceAll("\n", " ")

  /** Exact n-gram Jaccard similarity for a candidate pair list — the
    * verification stage after LSH (join back to texts, compute exact overlap). */
  def exactJaccard(spark: SparkSession, docs: DataFrame, pairs: DataFrame): DataFrame = {
    import spark.implicits._
    val texts = docs.select(col("doc_id").cast("long"), col("text"))
    val joined = pairs
      .join(texts.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("text", "text_a"), "doc_a")
      .join(texts.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("text", "text_b"), "doc_b")
      .select(col("doc_a").cast("long"), col("doc_b").cast("long"), col("text_a"), col("text_b"))
      .as[(Long, Long, String, String)]
    joined.map { case (a, b, ta, tb) =>
      val sa = shingles(ta)
      val sb = shingles(tb)
      val inter = sa.intersect(sb).size.toDouble
      val union = sa.union(sb).size.toDouble
      (a, b, if (union == 0) 0.0 else inter / union)
    }.toDF("doc_a", "doc_b", "jaccard")
      .withColumn("jaccard", round(col("jaccard"), 4))
  }
}
