package graft.kg

import graft.html.HtmlText
import graft.ner.NerSpark
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end, resumable KG-construction pipeline (the north rule):
  *
  *   web pages → deterministic HTML→text extraction (byte-verified against
  *   the `text` column) → batched mention detection (mapPartitions-wrapped
  *   annotator with prompt parity) → broadcast alias-dictionary candidate
  *   generation → top-1 disambiguation → connected-components alias
  *   canonicalization → `(subj, pred, obj)` triples partitioned by
  *   `bucket = pmod(xxhash64(url), numBuckets)` + per-bucket lineage/metrics.
  *
  * Resumability: a bucket is the unit of work. Completed buckets are
  * recorded in the metrics table; a re-run anti-joins the input against the
  * completed set and only processes the remainder, writing with dynamic
  * partition overwrite so a partially-written bucket (crash mid-job, no
  * metrics row) is simply rewritten — idempotent because every upstream
  * stage is a pure function of the input rows.
  *
  * Scale shape (the 100 TB story): extraction/mention detection are narrow
  * (no shuffle) over the scan; the alias join is broadcast; the only wide
  * stages are the per-mention top-1 window and the final distinct — both
  * keyed by url-derived keys that hot-domain skew cannot concentrate
  * (see [[Kg.saltedJoin]] for the non-broadcast dictionary fallback), and
  * the tiny alias-alias CC runs on dictionary-sized data, never on the corpus.
  */
object KgPipeline {

  /** @param useInputBucketColumn the input already carries a `bucket`
    *        column (the Iceberg `bucket(N, url)` partition-transform case —
    *        the standard table layout for this pipeline); trust it instead
    *        of hashing urls
    * @param alignedInput input tasks are bucket-aligned (each scan task
    *        holds rows of ~one bucket, as an Iceberg bucket-partitioned scan
    *        yields) — skip the pre-write repartition of the docs table, so
    *        the whole extraction stage is narrow: scan → annotate → write */
  final case class Config(
      outDir: String,
      numBuckets: Int = 64,
      sentencesPerCall: Int = 0,
      dict: Seq[(String, String)] = NerSpark.Dict,
      aliases: Seq[(String, String, Double)] = Kg.AliasesExtended,
      useInputBucketColumn: Boolean = false,
      alignedInput: Boolean = false,
      /** link via an explicit salted shuffled hash join instead of a
        * broadcast join — the path for alias dictionaries too large to
        * broadcast, where head-entity aliases ("spark") would otherwise
        * concentrate a shuffle key (north rule: salted hash-join
        * disambiguation). Results are identical to the broadcast path. */
      saltedLinking: Boolean = false,
      saltFactor: Int = 8,
      /** override the default deterministic [[graft.annotate.DictAnnotator]]
        * — e.g. a [[graft.annotate.HttpAnnotator]] bound to a model server.
        * Must be serializable (ships into mapPartitions). */
      annotator: Option[graft.annotate.Annotator] = None,
      /** drop exact-duplicate pages (same html bytes under different urls —
        * ~1/3 of a raw web crawl) before spending annotation on them. The
        * winner per content hash is chosen ONCE per outDir and persisted as
        * a `dedup_winners` manifest `(fp, url, copies)`, so resumed runs
        * keep the same winner set even when a duplicate's twin sits in an
        * already-committed bucket — resume stays byte-identical. Cost: one
        * tiny `(fp,url)` shuffle for the manifest plus one url-keyed
        * semi-join shuffle of the html-bearing input (this forfeits
        * `alignedInput` narrowness; corpora pre-deduped upstream should
        * keep dedupExact=false and the narrow path). */
      dedupExact: Boolean = false,
      /** drop NEAR-duplicate pages (MinHash-LSH clusters at
        * `nearMinJaccard`, [[graft.dedup.Dedup.clusters]]) before spending
        * annotation on them — the template-page/mirror case exact dedup
        * misses. Like `dedupExact`, the winner set is chosen ONCE per
        * outDir and persisted (`neardup_winners` manifest: one row per
        * cluster, `(cluster_id, url, copies)` with url = min url of the
        * cluster), so resume stays byte-identical. Cost: one MinHash
        * signature scan over the corpus + the LSH banding exchange +
        * pair-graph CC, then one url-keyed semi-join of the input.
        * Composes with `dedupExact` (exact runs first — LSH buckets of
        * mass-identical docs are its degenerate case). */
      dedupNear: Boolean = false,
      nearMinJaccard: Double = 0.9,
      /** lineage-preserving quality gate, applied AFTER the deterministic
        * HTML→text extraction and BEFORE annotation cost is spent: failing
        * docs are still written to docs/ (with `filtered = true`, empty
        * mentions) so the drop is auditable per bucket, but they are
        * excluded from linking and never reach the annotator. */
      minTextChars: Int = 0,
      langAllowed: Option[Set[String]] = None)

  final case class RunStats(
      runId: String,
      bucketsProcessed: Long,
      docs: Long,
      mentions: Long,
      triples: Long,
      htmlMismatches: Long,
      failedBatches: Long = 0L,
      /** duplicate pages dropped by the dedup manifest (whole-corpus figure,
        * from the manifest's `copies` column; 0 when dedupExact is off). */
      docsDeduped: Long = 0L,
      /** near-duplicate pages dropped by the neardup_winners manifest
        * (cluster sizes minus winners; 0 when dedupNear is off). */
      docsNearDeduped: Long = 0L,
      /** docs written with `filtered = true` by the quality gate. */
      docsFiltered: Long = 0L)

  def bucketCol(numBuckets: Int) = pmod(xxhash64(col("url")), lit(numBuckets))

  /** Buckets already committed (metrics row present). Existence is probed
    * through the Hadoop FileSystem API, so resume works on HDFS/S3 paths,
    * not only `file:` (the 100 TB deployment reads object storage). */
  def completedBuckets(spark: SparkSession, outDir: String): Set[Long] = {
    val metricsPath = new org.apache.hadoop.fs.Path(s"$outDir/metrics")
    val fs = metricsPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(metricsPath)) Set.empty
    else spark.read.parquet(metricsPath.toString)
      .select(col("bucket").cast("long")).distinct().collect().map(_.getLong(0)).toSet
  }

  /** Canonicalization map entity_id → canonical id: connected components
    * over the alias-sharing graph (two entities sharing an alias string are
    * the same real-world entity). The graph is DICTIONARY-sized, so this
    * runs as driver-side union-find and is broadcast — never ship
    * dictionary-scale work to the cluster (the DataFrame
    * [[ConnectedComponents]] loop is for corpus-scale graphs). */
  def canonicalMap(aliases: Seq[(String, String, Double)]): Map[String, String] = {
    val parent = scala.collection.mutable.Map.empty[String, String]
    def find(x: String): String = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: String, b: String): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    aliases.groupBy(_._1).values.foreach { group =>
      group.map(_._2).distinct.sorted match {
        case head +: tail => tail.foreach(union(head, _))
        case _ =>
      }
    }
    aliases.map(_._2).distinct.map(e => e -> find(e)).toMap
  }

  /** A distinct `(category, normalized surface)` pair of one document — the
    * link-ready projection of its mentions, precomputed at extraction time.
    * Linking joins on `surface_norm` and derives the predicate from
    * `category`; it never needs the span-level mention array, so
    * materializing this (≈3× smaller) column lets the candidate-generation
    * scan prune the wide `mentions` column entirely. */
  final case class LinkPair(category: String, surface_norm: String)

  /** One annotated-document row of the materialized `docs/` table.
    * `mentions` is the span-level product (lineage / evaluation);
    * `link_pairs` is the deduplicated link projection the triple path
    * reads; `n_mentions` duplicates `mentions.size` as a scalar so the
    * per-bucket metrics aggregation scans only narrow columns. */
  final case class DocRow(
      url: String,
      lang: String,
      html_ok: Boolean,
      mentions: Seq[graft.core.Mention],
      link_pairs: Seq[LinkPair],
      n_mentions: Int,
      failed_batches: Int,
      filtered: Boolean,
      bucket: Long)

  /** Build-once `_SUCCESS`-gated manifest at `path`. A crash mid-write
    * leaves a partial directory that bare exists() would trust, silently
    * dropping pages on resume — only the committer's `_SUCCESS` marker
    * makes a manifest authoritative; anything else is torn and rebuilt
    * (idempotent: manifests are pure functions of the full input). */
  private def manifestOnce(spark: SparkSession, path: String)(
      build: => DataFrame): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p) && !fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")))
      fs.delete(p, true)
    if (!fs.exists(p)) build.write.parquet(path)
    spark.read.parquet(path)
  }

  /** Pages a winners manifest drops: cluster sizes minus their winners. */
  private def droppedCopies(manifest: DataFrame): Long =
    Option(manifest.agg(sum(col("copies") - 1)).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)

  def run(spark: SparkSession, pages: DataFrame, cfg: Config): RunStats = {
    // dynamic overwrite is a per-write requirement of THIS pipeline, not a
    // session-wide policy — save and restore the caller's setting
    val overwriteKey = "spark.sql.sources.partitionOverwriteMode"
    val prevMode = spark.conf.getOption(overwriteKey)
    spark.conf.set(overwriteKey, "dynamic")
    try runInternal(spark, pages, cfg)
    finally prevMode match {
      case Some(v) => spark.conf.set(overwriteKey, v)
      case None    => spark.conf.unset(overwriteKey)
    }
  }

  private def runInternal(spark: SparkSession, pages: DataFrame, cfg: Config): RunStats = {
    import spark.implicits._
    val runId = java.util.UUID.randomUUID().toString
    val startMs = System.currentTimeMillis()

    val done = completedBuckets(spark, cfg.outDir)
    val withBucket =
      if (cfg.useInputBucketColumn && pages.columns.contains("bucket")) pages
      else pages.withColumn("bucket", bucketCol(cfg.numBuckets))

    // exact dedup (opt-in): the winners manifest is computed ONCE per outDir
    // over the FULL input — min(url) per content hash — and persisted, so a
    // resumed run filters against the SAME winner set (a fresh-slice-only
    // dedup would resurrect a duplicate whose winner is already committed).
    // The manifest job shuffles only (fp, url) pairs, never html.
    val (input, docsDeduped) =
      if (!cfg.dedupExact) (withBucket, 0L)
      else {
        val manifest = manifestOnce(spark, s"${cfg.outDir}/dedup_winners")(
          withBucket.select(col("url"), xxhash64(col("html")).as("fp"))
            .groupBy("fp").agg(min("url").as("url"), count(lit(1)).as("copies")))
        val dropped = droppedCopies(manifest)
        // winners are per CONTENT hash: semi-join on (url, fp) — a url
        // recrawled with different bytes is two content groups, and a
        // url-only filter would resurrect the losing payload's row
        val filtered = withBucket.withColumn("__fp", xxhash64(col("html")))
          .join(manifest.select(col("url"), col("fp").as("__fp")),
            Seq("url", "__fp"), "left_semi")
          .drop("__fp")
        (filtered, dropped)
      }

    // near-dup cluster collapse (opt-in, composes after exact): MinHash
    // pairs → connected components → min-url winner per cluster, persisted
    // once per outDir with the same _SUCCESS gating so resume keeps the
    // winner set. The doc key is xxhash64(url) (minhash wants a long id;
    // a 64-bit collision merely merges two docs into one cluster — at
    // ~2⁻⁶⁴ per pair, noise next to LSH's own false-positive rate). Text
    // (not html) feeds the shingles: markup differences between mirrors
    // are exactly what near-dup must see through.
    val (input2, docsNearDeduped) =
      if (!cfg.dedupNear) (input, 0L)
      else {
        val manifest = manifestOnce(spark, s"${cfg.outDir}/neardup_winners") {
          val keyed = input.select(xxhash64(col("url")).as("doc_id"),
            col("url"), col("text"))
          graft.dedup.Dedup.clusters(spark,
              keyed.select("doc_id", "text"), cfg.nearMinJaccard)
            .join(keyed.select("doc_id", "url"), "doc_id")
            .groupBy("cluster_id")
            .agg(min("url").as("url"), count(lit(1)).as("copies"))
        }
        val filtered = input.join(manifest.select("url"), Seq("url"), "left_semi")
        (filtered, droppedCopies(manifest))
      }

    // the html-bearing (widest) relation is consumed exactly once below;
    // nothing in this pipeline is persisted — intermediates are materialized
    // to the docs/ table instead (at corpus scale nothing fits in cache, and
    // 32-way MemoryStore writes were measured to serialize the scan stage)
    val todo = if (done.isEmpty) input2
               else input2.filter(!col("bucket").isin(done.toSeq: _*))

    // the emptiness probe costs a job — only pay it on resume, where all
    // buckets may already be complete (a fresh run just proceeds; writing an
    // empty slice is harmless)
    if (done.nonEmpty && todo.isEmpty) {
      return RunStats(runId, 0, 0, 0, 0, 0, docsDeduped = docsDeduped,
        docsNearDeduped = docsNearDeduped)
    }

    // 1. ONE narrow pass: deterministic HTML→text (byte-verified against the
    //    text column — per-row invariant) + batched mention detection, then
    //    materialize the annotated corpus as docs/ partitioned by bucket.
    //    This is the only stage that touches html; everything downstream
    //    reads the (much smaller) docs table with partition pruning.
    val sysPromptByLang = Seq("en", "es", "it")
      .map(l => l -> graft.annotate.Prompts.systemPrompt(l, NerSpark.Categories)).toMap
    val dictLocal = cfg.dict
    val spc = cfg.sentencesPerCall
    val catsLocal = NerSpark.Categories

    val annotatorCfg = cfg.annotator
    val minCharsLocal = cfg.minTextChars
    val langAllowLocal = cfg.langAllowed
    val annotated = todo
      .select($"url", $"html", $"text".as("text_expected"), $"lang", col("bucket").cast("long"))
      .as[(String, Array[Byte], String, String, Long)]
      .mapPartitions { it =>
        val annotator = annotatorCfg.getOrElse(graft.annotate.DictAnnotator(dictLocal))
        it.map { case (url, html, expected, lang, bucket) =>
          val text = HtmlText.extract(html)
          val keep = text.length >= minCharsLocal &&
            langAllowLocal.forall(_.contains(lang))
          if (!keep)
            DocRow(url, lang, text == expected, Nil, Nil, 0, 0,
              filtered = true, bucket)
          else {
            val sys = sysPromptByLang.getOrElse(lang, sysPromptByLang("en"))
            val (ms, failed) = graft.annotate.MentionExtractor
              .extractWithStats(annotator, sys, catsLocal, text, spc)
            val pairs = ms.map(m => LinkPair(m.category, m.surface.trim.toLowerCase))
              .distinct
            DocRow(url, lang, text == expected, ms, pairs, ms.size, failed,
              filtered = false, bucket)
          }
        }
      }
      .toDF()
    // bucket-aligned input (Iceberg bucketed scan): every task already holds
    // ~one bucket, so the write is narrow; otherwise one exchange co-locates
    // each bucket into a single writing task
    (if (cfg.alignedInput) annotated
     else annotated.repartition(cfg.numBuckets, col("bucket")))
      .write.mode(SaveMode.Overwrite).partitionBy("bucket")
      .parquet(s"${cfg.outDir}/docs")

    def freshOnly(df: DataFrame): DataFrame =
      if (done.isEmpty) df else df.filter(!col("bucket").isin(done.toSeq: _*))
    // partition-pruned on resume (bucket is the partition column)
    val freshDocs = freshOnly(spark.read.parquet(s"${cfg.outDir}/docs"))

    // 2. candidate generation + disambiguation in ONE broadcast join: the
    //    alias priors are static, so top-1 per alias is precomputed on the
    //    driver ([[Kg.winnersPerAlias]]) — no per-mention window; alias-graph
    //    CC canonicalization (dictionary-sized union-find) is folded into
    //    the same broadcast dictionary
    val canon = canonicalMap(cfg.aliases)
    val winners = Kg.winnersPerAlias(cfg.aliases)
      .map { case (a, e, s) => (a, canon.getOrElse(e, e), s) }
    val winnersDf = winners.toDF("alias", "entity_id", "score")

    // the link projection explodes the small precomputed distinct-pair
    // column — the wide span-level `mentions` column is pruned out of this
    // scan entirely (it is only written, and aggregated via `n_mentions`)
    val mentionRows = freshDocs
      .filter(!col("filtered"))
      .select(col("url"), col("bucket"), explode(col("link_pairs")).as("m"))
      .select(col("url"), col("bucket"),
        col("m.category").as("category"), col("m.surface_norm").as("surface_norm"))
    val linked =
      if (cfg.saltedLinking)
        Kg.saltedJoin(mentionRows, winnersDf, "surface_norm", "alias",
          pmod(xxhash64(col("url"), col("surface_norm")), lit(cfg.saltFactor)), cfg.saltFactor)
      else
        mentionRows.join(broadcast(winnersDf), col("surface_norm") === col("alias"), "inner")

    // 3. triples with lineage, deduplicated and write-placed in ONE wide
    //    stage: a triple's obj embeds its url and bucket = f(url), so global
    //    distinct == per-bucket distinct. A narrow per-task pre-dedup stands
    //    in for distinct()'s partial HashAggregate (shrinks shuffle volume
    //    ~the per-doc surface repetition factor), then the single exchange
    //    keys by bucket — which is exactly the write placement — and a
    //    per-task hash-set finishes the dedup. This replaces the former
    //    distinct() + repartition(bucket) back-to-back exchanges (round-1
    //    scaling bottleneck). Per-task set size = distinct triples of ~one
    //    bucket; numBuckets is the knob that bounds it at any corpus scale.
    val predCol = NerSpark.Predicates.foldLeft(lit(null).cast("string")) {
      case (acc, (cat, p)) => when(col("category") === cat, lit(p)).otherwise(acc)
    }
    def dedupInTask(it: Iterator[(String, String, String, Long)]) = {
      val seen = new java.util.HashSet[(String, String, String, Long)]()
      it.filter(seen.add)
    }
    // per-doc variant: obj embeds the url, so a change of obj marks a
    // document boundary — reset the (subj, pred) set there
    def dedupPerDoc(it: Iterator[(String, String, String, Long)]) = {
      var curObj: String = null
      val seen = new java.util.HashSet[(String, String)]()
      it.filter { case (s, p, o, _) =>
        if (o != curObj) { curObj = o; seen.clear() }
        seen.add((s, p))
      }
    }
    // lineage: obj IS the source-page URI, so no separate url column —
    // one less string per row through the dedup shuffle
    val t0 = linked
      .select(col("entity_id").as("subj"), predCol.as("pred"),
        concat(lit("page://"), col("url")).as("obj"), col("bucket").cast("long"))
      .filter(col("pred").isNotNull)
      .as[(String, String, String, Long)]
    // Duplicate triples can only arise WITHIN a document (two aliases of
    // one canonical entity on the same page — obj embeds the url, so
    // cross-document triples always differ). On the broadcast path a
    // document's rows stay contiguous within their scan task (explode and
    // the streamed join preserve partition-local order), so an O(doc)-sized
    // set that resets at each url boundary removes every duplicate — and
    // the exchange needs NO downstream dedup. A 5M-doc bisect measured the
    // former per-task HashSets at 35 s of a 63 s run while removing zero
    // rows (set cardinality grew with per-task volume: superlinear in
    // corpus size at fixed cores); per-doc state is O(8) at ANY scale.
    // The salted path shuffles rows and loses doc contiguity — it keeps
    // per-task sets on both sides of its exchange.
    val deduped =
      if (cfg.saltedLinking)
        t0.mapPartitions(dedupInTask)
          .toDF("subj", "pred", "obj", "bucket")
          .repartition(cfg.numBuckets, col("bucket"))
          .as[(String, String, String, Long)]
          .mapPartitions(dedupInTask)
          .toDF("subj", "pred", "obj", "bucket")
      else
        t0.mapPartitions(dedupPerDoc)
          .toDF("subj", "pred", "obj", "bucket")
          .repartition(cfg.numBuckets, col("bucket"))
    deduped.write.mode(SaveMode.Overwrite).partitionBy("bucket")
      .parquet(s"${cfg.outDir}/triples")

    // 4. per-bucket lineage + extraction metrics (reference op 19
    //    replacement) — pure aggregation over the two materialized tables.
    //    Explicit schema: a run with zero dictionary hits writes no triple
    //    partitions, and schema inference over the empty directory would
    //    throw — the metrics commit must still happen (triples=0).
    val tripleSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "subj STRING, pred STRING, obj STRING, bucket BIGINT")
    val freshTriples = freshOnly(
      spark.read.schema(tripleSchema).parquet(s"${cfg.outDir}/triples"))
    val docStats = freshDocs.groupBy("bucket").agg(
      count(lit(1)).as("docs"),
      sum(when(!col("html_ok"), 1L).otherwise(0L)).as("html_mismatches"),
      sum(col("n_mentions").cast("long")).as("mentions"),
      sum(col("failed_batches").cast("long")).as("failed_batches"),
      sum(when(col("filtered"), 1L).otherwise(0L)).as("docs_filtered"))
    val tStats = freshTriples.groupBy("bucket").agg(count(lit(1)).as("triples"))
    val metrics = docStats.join(tStats, Seq("bucket"), "left")
      .na.fill(0L, Seq("triples"))
      .withColumn("run_id", lit(runId))
      .withColumn("wall_ms", lit(System.currentTimeMillis() - startMs))

    // collect the (bucket-sized) metrics once, then append them from the
    // driver — run stats need no extra corpus-scale jobs or read-backs
    val rows = metrics.collect()
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), metrics.schema)
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(s"${cfg.outDir}/metrics")
    RunStats(
      runId,
      bucketsProcessed = rows.length.toLong,
      docs = rows.map(_.getAs[Long]("docs")).sum,
      mentions = rows.map(_.getAs[Long]("mentions")).sum,
      triples = rows.map(_.getAs[Long]("triples")).sum,
      htmlMismatches = rows.map(_.getAs[Long]("html_mismatches")).sum,
      failedBatches = rows.map(_.getAs[Long]("failed_batches")).sum,
      docsDeduped = docsDeduped,
      docsNearDeduped = docsNearDeduped,
      docsFiltered = rows.map(_.getAs[Long]("docs_filtered")).sum)
  }
}
