package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link prediction over an undirected co-occurrence graph — the relation-
  * inference step that closes the KG-construction loop: after entities are
  * linked and co-mention edges counted, propose the MISSING edges whose
  * neighborhoods overlap more than chance. Scores are the three classical
  * neighborhood measures (Liben-Nowell & Kleinberg '03): common-neighbor
  * count, Jaccard overlap of neighborhoods, and Adamic-Adar
  * (Σ_w 1/ln deg(w) over shared neighbors — rare shared neighbors count
  * more than celebrity ones).
  *
  * Scale shape: candidate pairs come from WEDGE enumeration, not an
  * all-pairs join — each center node emits its neighbor pairs from ONE
  * aggregated sorted array ([[Cooccur]]'s posexplode+slice layout, pure
  * Catalyst). Per-center fan-out is deg²/2, so hubs are the scale hazard
  * ("curse of the last reducer"); the cap excludes centers above
  * `maxHubDegree` BEFORE the array is built, which (a) bounds every
  * aggregation buffer and every per-row explode at maxHubDegree entries,
  * and (b) is principled for Adamic-Adar — an excluded hub's per-wedge
  * weight 1/ln(deg) is exactly the term the measure already discounts
  * toward zero. Degrees for Jaccard use the FULL graph (the cap gates
  * only wedge centers, not score semantics). The existing-edge anti-join
  * runs on the canonical (u<v) orientation both sides share, and the
  * vocabulary-sized degree relation joins back via AQE broadcast.
  */
object LinkPredict {

  /** Data-relative wedge-center cap: the `pct` exact degree percentile of
    * the graph, floored to a long (≥ 2 so a center can still have a
    * wedge). A fixed cap constant is tuned to ONE graph density — at a
    * different scale factor it either admits every hub (cap above the
    * degree ceiling: the quadratic blow-up returns) or excludes everything.
    * The percentile form is the production knob: "skip the densest
    * (1−pct) of centers" holds at any density, and it is exactly what the
    * q52 heavy-hitter profiler reports. Cost: one degree aggregate + a
    * single-group percentile — vocabulary-sized, run once and memoized by
    * the caller (the oracle inlines the measured value, like q73's
    * measured peel depth). */
  def measuredHubCap(canonical: DataFrame, pct: Double = 0.75): Long = {
    val und = canonical.select(col("u").as("w"))
      .union(canonical.select(col("v").as("w")))
    val d = und.groupBy("w").agg(count(lit(1)).as("d"))
      .agg(coalesce(expr(s"percentile(d, $pct)"), lit(2.0))).head().getDouble(0)
    math.max(2L, d.toLong)
  }

  /** Scored non-adjacent candidate pairs
    * `(e1, e2, n_common, jaccard, score_aa)` with `e1 < e2`, keeping pairs
    * with ≥ `minCommon` shared neighbors. (The Adamic-Adar column is named
    * so it sorts AFTER the unique (e1, e2) key — the driver's compare
    * sorts columns alphabetically, and a float must never lead the row
    * ordering or 1-ulp cross-engine drift can swap tied rows.)
    *
    * @param canonical     output of [[Triangles.canonicalEdges]] (u<v, distinct)
    * @param maxHubDegree  wedge centers above this degree are skipped
    * @param minCommon     emit only pairs with at least this many shared
    *                      neighbors (the support threshold that keeps the
    *                      candidate list proposal-sized, not quadratic)
    */
  def candidates(canonical: DataFrame, maxHubDegree: Long,
      minCommon: Long): DataFrame = {
    // Loop-invariant inputs are localCheckpoint-ed once: the candidate
    // generation below runs SEVERAL jobs (count pass, Adamic-Adar pass,
    // final joins), and without the checkpoint every job would re-derive
    // the caller's whole edge lineage (q75: the lineitem self-join +
    // distinct) — the multiply-referenced-subplan rule (guide §2.4), now
    // applied across jobs where exchange reuse cannot.
    val canon = canonical.select("u", "v").localCheckpoint()
    val und = canon.select(col("u").as("w"), col("v").as("n"))
      .union(canon.select(col("v").as("w"), col("u").as("n")))
    val deg = und.groupBy("w").agg(count(lit(1)).as("d")).localCheckpoint()

    // capped adjacency (centers with d ≤ maxHubDegree only): feeds both
    // the wedge arrays and phase 2's survivor re-scoring — checkpointed
    // once, O(|E|) rows of three columns.
    val capped = und.join(deg.filter(col("d") <= maxHubDegree), "w")
      .localCheckpoint()
    // per-center sorted neighbor array, hub centers excluded up front so
    // the collect_set buffer is bounded at maxHubDegree entries.
    // The array frame is node-count-sized but its explode fan-out is
    // Σ d²/2 — REPARTITION it round-robin first so the quadratic
    // enumeration work spreads over every core instead of the handful of
    // post-aggregation partitions the hub arrays hash into (guide §2.5:
    // the enumeration skew is in rows-PRODUCED, which AQE cannot see).
    // The task COUNT is sized from the MEASURED wedge fan-out (deg is
    // checkpointed, so the probe aggregate is one cheap job), targeting
    // ~250k enumerated wedges per task: the near-unique-key partial
    // aggregation below degrades sharply once a task's hash table runs
    // to millions of entries (measured 23 s at 32 tasks vs 7.7 s
    // fan-out-sized at sf0.1, OPTIMIZATION_r06) — AQE cannot make this
    // call because the skew is in rows PRODUCED by the explode.
    val shufflePartitions = canonical.sparkSession.sessionState.conf.numShufflePartitions
    val fanout = deg.filter(col("d") <= maxHubDegree)
      .agg(coalesce(sum(col("d") * (col("d") - lit(1))), lit(0L)))
      .head().getLong(0) / 2
    val nparts = math.min(4096,
      math.max(shufflePartitions, (fanout / 250000L).toInt))
    val lists = capped
      .groupBy(col("w"), col("d"))
      .agg(sort_array(collect_set(col("n"))).as("ns"))
      .repartition(nparts)
    // TWO-PHASE scoring — ONE Σ d²/2 wedge enumeration total:
    // phase 1 counts support only — the narrowest possible rows through
    // the one giant near-unique-key aggregation (Σ d²/2 wedge rows,
    // almost one group per row, so partial aggregation cannot shrink it
    // and every byte per row is shuffle cost, guide §2.3); the
    // minCommon filter then collapses the stream to the proposal-sized
    // survivor set. When node ids are integral, non-negative, and fit
    // 31 bits (MEASURED on the checkpointed deg — one tiny job), the
    // pair key is packed into ONE long (`e1·2³² + e2`, exact and
    // bijective): half the shuffle bytes of the two-long key and a
    // single-column aggregation map (guide §2.3 "narrower types" with a
    // runtime proof instead of an assumption); ids outside the gate
    // keep the two-column key — identical semantics either way.
    val wedges = lists
      .select(posexplode(col("ns")).as(Seq("i", "e1")), col("ns"))
      // slice is 1-based: neighbors strictly after position i (0-based e1)
      .select(col("e1"),
        explode(slice(col("ns"), col("i") + 2, size(col("ns")))).as("e2"))
    val integral = canon.schema("u").dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType => true
      case _ => false
    }
    val packable = integral && {
      val r = deg.agg(min(col("w").cast("long")), max(col("w").cast("long")))
        .head()
      !r.isNullAt(0) && r.getLong(0) >= 0L && r.getLong(1) < 2147483648L
    }
    val dt = canon.schema("u").dataType
    val counts = (if (packable)
      wedges
        .select((col("e1").cast("long") * 4294967296L +
          col("e2").cast("long")).as("pk"))
        .groupBy("pk").agg(count(lit(1)).as("n_common"))
        .filter(col("n_common") >= minCommon)
        .select(expr("pk DIV 4294967296").cast(dt).as("e1"),
          expr("pk % 4294967296").cast(dt).as("e2"), col("n_common"))
    else
      wedges.groupBy("e1", "e2")
        .agg(count(lit(1)).as("n_common"))
        .filter(col("n_common") >= minCommon))
      .localCheckpoint()
    // Phase 2 re-finds the few survivors' common capped centers with two
    // adjacency equi-joins — fan-out Σ_surv deg_capped(e1), then exactly
    // Σ_surv n_common rows — instead of re-enumerating every wedge a
    // second time (measured: the re-enumeration doubled q75 and turned
    // q122's train-graph replay into a second full pass,
    // OPTIMIZATION_r06). The survivor side is broadcast under a MEASURED
    // gate (counts is checkpointed, so the count is free); above the
    // gate the shuffled join is the correct plan. The per-pair
    // Adamic-Adar folds a center-sorted struct array — a fixed summation
    // order, so the float result is a pure function of the graph
    // instead of partition-arrival order.
    val survPairs0 = counts.select("e1", "e2")
    val survPairs =
      if (counts.count() <= 5000000L) broadcast(survPairs0) else survPairs0
    val wE1 = capped.select(col("n").as("e1"), col("w"), col("d"))
      .join(survPairs, Seq("e1"))
    val aa = wE1
      .join(capped.select(col("n").as("e2"), col("w")), Seq("e2", "w"))
      .groupBy("e1", "e2")
      .agg(aggregate(sort_array(collect_list(struct(col("w"), col("d")))),
        lit(0.0),
        // a wedge center has >= 2 neighbors, so ln(d) > 0 here
        (acc, x) => acc + lit(1.0) / log(x.getField("d").cast("double")))
        .as("aa_raw"))
    val scored = counts.join(aa, Seq("e1", "e2"))

    scored
      // link PREDICTION proposes absent edges — drop pairs already joined
      .join(canon.select(col("u").as("e1"), col("v").as("e2")),
        Seq("e1", "e2"), "left_anti")
      .join(deg.select(col("w").as("e1"), col("d").as("d1")), "e1")
      .join(deg.select(col("w").as("e2"), col("d").as("d2")), "e2")
      .select(col("e1"), col("e2"), col("n_common"),
        round(col("n_common") / (col("d1") + col("d2") - col("n_common")), 4)
          .as("jaccard"),
        round(col("aa_raw"), 4).as("score_aa"))
  }

  /** Ranking evaluation of [[candidates]] — the held-out protocol that
    * turns "we propose edges" into a measured claim (the Liben-Nowell &
    * Kleinberg methodology): deterministically hold out one md5 bucket
    * of true edges ([[graft.core.Buckets]]' shared primitive — the SAME
    * split any replaying engine derives), regenerate candidates on the
    * remaining graph, and score how the removed edges rank among the
    * proposals. One summary row:
    * `(n_holdout, n_ranked, mrr_micro_sum, n_hits1, n_hits3, n_hits10)`
    * — `n_ranked` counts held-out edges that appear in the candidate
    * list at all; `mrr_micro_sum` is Σ round(10⁶ / rank) over ranked
    * edges (PER-TERM integer rounding before the sum, so the total is
    * order-independent and exact — a float sum's result depends on
    * reduction order across partitions and can never hash-match a
    * replay); hits@k count ranks ≤ k. MRR ≈ mrr_micro_sum / (10⁶ ·
    * n_holdout) — the caller divides, the engine ships integers.
    *
    * Ranking is per e1 (the canonical lower endpoint) by
    * `(n_common desc, e2 asc)` — an integer key with a deterministic
    * tie-break; the float Jaccard/Adamic-Adar columns never order
    * anything (the cross-engine 1-ulp discipline [[candidates]]
    * documents).
    *
    * Scale shape: the split is a narrow expression; candidate
    * generation is [[candidates]]' wedge shape on the train edges; the
    * rank is one window whose partitions are per-node candidate lists
    * (minCommon-bounded, not corpus-sized); the lookup is one equi-join
    * of the holdout (a few % of edges) against ranked candidates,
    * AQE-broadcast when small; the final aggregate is a single
    * map-side-combined collapse to one row. */
  def evalRanking(canonical: DataFrame, holdoutMod: Int, holdoutBucket: Int,
      maxHubDegree: Long, minCommon: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(holdoutMod >= 2 && holdoutBucket >= 0 && holdoutBucket < holdoutMod,
      s"bad holdout split: bucket $holdoutBucket of mod $holdoutMod")
    // the residency contract ([[TriplePatterns.closure]]): train feeds
    // und (twice), the existing-edge anti-join, and deg — without the
    // persist each reference re-derives the caller's upstream lineage
    // (q122: a shuffle-heavy self-join + per-edge md5 bucketing) ~6×
    val keyed = canonical.withColumn("hb",
      graft.core.Buckets.md5Bucket(
        concat(col("u").cast("string"), lit(":"), col("v").cast("string")),
        holdoutMod))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val held = keyed.filter(col("hb") === holdoutBucket).select("u", "v")
    val train = keyed.filter(col("hb") =!= holdoutBucket).select("u", "v")
    // The rank key is `(n_common desc, e2 asc)` — the float scores never
    // order anything — so ranking needs ONLY the support counts: build
    // them here instead of through [[candidates]], skipping the
    // Adamic-Adar/Jaccard legs outright (don't compute what the query
    // throws away, guide §1.2; the frozen DuckDB oracle ranks from the
    // identical count-only relation). This path is deliberately LAZY —
    // no eager checkpoint/probe jobs — a single DAG Catalyst is free to
    // prune per action; every relation below is referenced once.
    val und = train.select(col("u").as("w"), col("v").as("n"))
      .union(train.select(col("v").as("w"), col("u").as("n")))
    val deg = und.groupBy("w").agg(count(lit(1)).as("d"))
    val shufflePartitions =
      canonical.sparkSession.sessionState.conf.numShufflePartitions
    val counts = und.join(deg.filter(col("d") <= maxHubDegree), "w")
      .groupBy(col("w"), col("d"))
      .agg(sort_array(collect_set(col("n"))).as("ns"))
      .repartition(shufflePartitions)
      .select(posexplode(col("ns")).as(Seq("i", "e1")), col("ns"))
      .select(col("e1"),
        explode(slice(col("ns"), col("i") + 2, size(col("ns")))).as("e2"))
      .groupBy("e1", "e2")
      .agg(count(lit(1)).as("n_common"))
      .filter(col("n_common") >= minCommon)
    val ranked = counts
      .join(train.select(col("u").as("e1"), col("v").as("e2")),
        Seq("e1", "e2"), "left_anti")
      .withColumn("r", row_number().over(
        Window.partitionBy("e1").orderBy(desc("n_common"), asc("e2")))
        .cast("long"))
    held
      .join(ranked.select(col("e1").as("u"), col("e2").as("v"), col("r")),
        Seq("u", "v"), "left")
      .agg(count(lit(1)).as("n_holdout"),
        count(col("r")).as("n_ranked"),
        coalesce(sum(round(lit(1000000.0) / col("r")).cast("long")), lit(0L))
          .as("mrr_micro_sum"),
        count(when(col("r") <= 1, 1)).as("n_hits1"),
        count(when(col("r") <= 3, 1)).as("n_hits3"),
        count(when(col("r") <= 10, 1)).as("n_hits10"))
  }
}
