package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram language-model quality score — the shape of the CCNet/KenLM
  * perplexity filter, with the corpus itself as the model: each document
  * scores the mean natural-log probability of its tokens under corpus
  * unigram frequencies. Very low scores flag rare-token gibberish and
  * encoding damage; very high scores flag boilerplate-heavy text — both
  * tails are what a production filter trims.
  *
  * Scale shape: one token-keyed two-phase aggregate builds the model
  * (partial map-side combine), then the counts join back to the token
  * stream — broadcast ONLY when the MEASURED vocabulary fits (the q54
  * TF-IDF lesson: crawl vocabularies are not small), else a shuffled join
  * AQE sizes. The token stream is recomputed (narrow explode) rather than
  * persisted — at corpus scale the recompute is cheaper than caching every
  * token row (the same trade line-level dedup makes).
  */
object LmScore {

  /** `(doc_id, n_tokens, avg_logprob)` for every document with ≥1
    * whitespace token; `avg_logprob = avg(ln(count(tok)/N))` rounded to 4
    * decimals. */
  def unigramLogProb(docs: DataFrame, maxBroadcastVocab: Long = 5000000L): DataFrame = {
    val toks = docs.select(col("doc_id").cast("long").as("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val head = counts.agg(
      coalesce(sum("c"), lit(0L)).as("n"), count(lit(1)).as("v")).head()
    val (nTotal, vocab) = (head.getLong(0), head.getLong(1))
    val model = if (vocab <= maxBroadcastVocab) broadcast(counts) else counts
    toks.join(model, "tok")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(log(col("c").cast("double") / nTotal)), 4).as("avg_logprob"))
  }

  /** Bigram-LM quality score with add-1 (Laplace) smoothing — the order-2
    * refinement of [[unigramLogProb]]: per document,
    * `avg_logprob = avg(ln((c(w1,w2)+1) / (c(w1)+V)))` over its bigrams,
    * where `c(w1,w2)` is the corpus bigram count, `c(w1)` the corpus count
    * of `w1` AS A BIGRAM CONTEXT (i.e. excluding document-final tokens),
    * and `V` the corpus vocabulary size. The bigram model catches
    * shuffled-word and template-stitched text that unigram frequencies
    * score as perfectly fluent — the next filter a corpus pipeline adds
    * after CCNet's unigram pass.
    *
    * Scale shape: bigrams are built NARROW — `arrays_zip` of two shifted
    * `slice`s of the per-doc token array, no self-join and no window over
    * token position — then one (w1,w2)-keyed and one w1-keyed two-phase
    * aggregate build the model, and both join back to the bigram stream
    * (broadcast only under the MEASURED model size, same gate as the
    * unigram path). Documents with fewer than two tokens emit no rows.
    *
    * @return `(doc_id, n_bigrams, avg_logprob)`, logprob rounded to 4. */
  def bigramLogProb(docs: DataFrame, maxBroadcastVocab: Long = 5000000L): DataFrame = {
    val withToks = docs.select(col("doc_id").cast("long").as("doc_id"),
      filter(split(trim(col("text")), "\\s+"), t => t =!= lit("")).as("toks"))
    val bigrams = withToks
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(
        arrays_zip(
          slice(col("toks"), lit(1), size(col("toks")) - 1).as("w1"),
          slice(col("toks"), lit(2), size(col("toks")) - 1).as("w2"))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val cb = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cu = bigrams.groupBy("w1").agg(count(lit(1)).as("cu"))
    val vocab = withToks.select(explode(col("toks")).as("tok"))
      .agg(countDistinct(col("tok"))).head().getLong(0)
    val nBigramTypes = cb.count() // materializes the cache; gates the plan
    val bModel = if (nBigramTypes <= maxBroadcastVocab) broadcast(cb) else cb
    val uModel = if (nBigramTypes <= maxBroadcastVocab) broadcast(cu) else cu
    bigrams.join(bModel, Seq("w1", "w2")).join(uModel, Seq("w1"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log((col("cb") + lit(1.0)) / (col("cu") + lit(vocab.toDouble)))), 4)
          .as("avg_logprob"))
  }

  /** Perplexity-bucket rollup — the CCNet deployment shape: score every
    * document ([[unigramLogProb]]), cut the score distribution into
    * `nBuckets` quantile buckets, and report each bucket's size and score
    * range. CCNet ships its corpus as head/middle/tail perplexity thirds;
    * training-data ablations sample by these buckets.
    *
    * Scale shape: the global `ntile` window a naive version reaches for
    * is a single-task sort of the corpus — instead, the (nBuckets−1)
    * interior cutpoints are ONE single-group percentile aggregate (scores
    * are already per-doc rows, corpus-count-sized), the tiny cutpoint
    * array rides into a literal expression, and bucket assignment is a
    * narrow per-row comparison sum (`bucket = #{cut < score}` — strict,
    * so ties land in the lower bucket deterministically). Exact
    * percentile is the oracle-gate path; at 10¹²-doc scale swap in
    * `percentile_approx` (accuracy-pinned in SketchSpec) — assignment
    * and rollup are unchanged.
    *
    * @return `(bucket, n_docs, lp_min, lp_max)`, one row per non-empty
    *         bucket, buckets numbered 0 (lowest scores) upward. */
  def perplexityBuckets(docs: DataFrame, nBuckets: Int = 10): DataFrame = {
    val scored = scoredDocs(docs)
    bucketsFromScored(scored, cutpointsOf(scored, nBuckets))
  }

  /** The scored corpus, PERSISTED — cutpoint measurement and bucket
    * binning must read one materialization: re-deriving the scores per
    * consumer doubles the dominant cost AND re-opens the last-bit window
    * where independently re-aggregated averages round differently at a
    * 4-decimal boundary. CacheManager keys by canonicalized plan, so
    * q66/q95 invocations over the same table share one copy. */
  def scoredDocs(docs: DataFrame): DataFrame =
    unigramLogProb(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** [[perplexityBuckets]] with a caller-supplied cutpoint list — the
    * memo path: the query run and the oracle generation must bin with
    * the SAME measured cutpoints, not two independently re-measured
    * lists, so callers score once ([[scoredDocs]]), measure once
    * ([[cutpointsOf]]), memoize, and pass the values to both sides. */
  def bucketsAt(docs: DataFrame, cuts: Seq[Double]): DataFrame =
    bucketsFromScored(scoredDocs(docs), cuts)

  /** Bin an already-scored (and ideally persisted) corpus. */
  def bucketsFromScored(scored: DataFrame, cuts: Seq[Double]): DataFrame = {
    val bucket = cuts.map(c => when(col("avg_logprob") > c, 1).otherwise(0))
      .reduceOption(_ + _).getOrElse(lit(0)).cast("int")
    scored.groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min("avg_logprob").as("lp_min"), max("avg_logprob").as("lp_max"))
  }

  /** The interior cutpoints [[perplexityBuckets]] would compute — exposed
    * so the oracle can inline the ENGINE-measured values (the q42
    * trained-centroids pattern). Cross-engine exact-percentile parity is
    * NOT assumable: Spark interpolates `lower + frac·(higher−lower)`,
    * DuckDB `(1−frac)·lower + frac·higher` — last-bit-different floats,
    * and a score exactly at a cutpoint then flips buckets (observed at
    * sf0.001). Inlining the engine's cutpoints removes the parity
    * requirement entirely. Empty (or all-blank-text) corpora yield NO
    * scores and a NULL percentile — returned as an empty cutpoint list
    * (one bucket), never an NPE (the same empty-table hardening as
    * `oracleSqlFor`'s bound derivation). */
  def scoreCutpoints(docs: DataFrame, nBuckets: Int = 10): Seq[Double] =
    cutpointsOf(scoredDocs(docs), nBuckets)

  /** [[scoreCutpoints]] over an already-scored corpus (see [[scoredDocs]]
    * for why callers should score once and share). */
  def cutpointsOf(scored: DataFrame, nBuckets: Int): Seq[Double] = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    val ps = (1 until nBuckets).map(i => i.toDouble / nBuckets)
    val row = scored
      .agg(expr(s"percentile(avg_logprob, array(${ps.mkString(", ")}))"))
      .head()
    if (row.isNullAt(0)) Seq.empty else row.getSeq[Double](0)
  }

  /** The q66 per-doc unigram-score replay as shared CTEs ending in
    * `sc(doc_id, n_tokens, lp)` — ONE definition consumed by the q66
    * oracle and both q95 oracle variants (the `HashedTfCtes` precedent:
    * gate-critical scoring SQL must not exist in divergence-prone
    * copies). */
  val ScoreCtes: String =
    """toks AS (SELECT doc_id,
      |   unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents),
      | nz AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
      | c AS (SELECT tok, count(*) AS c FROM nz GROUP BY 1),
      | n AS (SELECT sum(c) AS n FROM c),
      | sc AS (SELECT nz.doc_id, count(*) AS n_tokens,
      |   round(avg(ln(c.c / n.n)), 4) AS lp
      |  FROM nz JOIN c ON nz.tok = c.tok CROSS JOIN n
      |  GROUP BY nz.doc_id)""".stripMargin.replaceAll("\n", " ")

  private val BucketSelect =
    """SELECT len(list_filter(q.cuts, c -> sc.lp > c))::int AS bucket,
      |  count(*) AS n_docs, min(sc.lp) AS lp_min, max(sc.lp) AS lp_max
      | FROM sc CROSS JOIN q GROUP BY 1""".stripMargin.replaceAll("\n", " ")

  /** [[perplexityBuckets]] as SQL over the q66 oracle scores, bucketed at
    * the given ENGINE-MEASURED cutpoints (see [[scoreCutpoints]] for why
    * the oracle must not re-derive them with its own percentile). */
  def bucketsOracleSql(cuts: Seq[Double]): String =
    // Double.toString is the shortest round-trip form — DuckDB parses it
    // back to the identical bit pattern, so `>` compares match exactly
    s"""WITH $ScoreCtes,
       | q AS (SELECT [${cuts.mkString(", ")}]::DOUBLE[] AS cuts)
       | $BucketSelect""".stripMargin.replaceAll("\n", " ")

  /** Static fallback when no SparkSession is available to measure the
    * cutpoints: DuckDB's own `quantile_cont`. Correct whenever no score
    * lands exactly on a cutpoint; [[scoreCutpoints]]-based generation
    * (`oracleSqlFor`) replaces it in the driver gate. */
  def bucketsOracleSqlStatic(nBuckets: Int): String = {
    val ps = (1 until nBuckets).map(i => i.toDouble / nBuckets)
    s"""WITH $ScoreCtes,
       | q AS (SELECT quantile_cont(lp, [${ps.mkString(", ")}]) AS cuts FROM sc)
       | $BucketSelect""".stripMargin.replaceAll("\n", " ")
  }
}
