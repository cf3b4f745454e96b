package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Truth discovery over multi-source fact claims — the RESOLUTION step
  * that acts on what [[Ontology.functionalViolations]] only measures.
  * When N extraction sources (prompt versions, upstream models, crawl
  * snapshots) each assert an object for a single-valued `(subj, pred)`
  * item, the merged KG must pick ONE canonical object; majority vote is
  * the standard data-fusion baseline (Li et al., "Truth Finding on the
  * Deep Web", VLDB 2013 — VOTE — and Dong/Srivastava's data-fusion
  * survey), and the deterministic variant here is what a reproducible
  * pipeline ships: highest distinct-source support wins, ties broken by
  * the lexicographically smallest object.
  */
object Fusion {

  /** Per-source reliability weights for [[weightedVote]], calibrated on a
    * labeled gold subset — the naive-Bayes/Dawid-Skene log-odds rule:
    * a source with Laplace-smoothed gold accuracy `a` votes with weight
    * `ln(a / (1 - a))`, so a coin-flip source weighs ~0, an anti-correlated
    * source weighs NEGATIVE, and weights ADD across independent sources.
    * Weights are returned as micro-log-odds LONGS (`round(w * 1e6)`) so
    * every downstream sum and comparison is exact integer arithmetic —
    * no float-summation-order hazard in the engine or in a replaying
    * oracle (the q42 engine-measured-literals pattern).
    *
    * The collect is bounded by the DISTINCT SOURCE COUNT (a handful of
    * extractors), never by the claim volume: one map-side-combined
    * aggregation over the gold join, then a driver-side log per source.
    *
    * @param claims `(subj, pred, obj, source)` claim rows
    * @param gold   `(subj, pred, obj)` trusted facts on a calibration
    *               subset of the items
    * @return source (as string) → micro-log-odds weight
    */
  def sourceWeightsMicro(claims: DataFrame, gold: DataFrame): Map[String, Long] = {
    val votes = claims.select("subj", "pred", "obj", "source").distinct()
    val g = gold.select(col("subj"), col("pred"), col("obj").as("gold_obj"))
      .distinct()
    votes.join(g, Seq("subj", "pred"))
      .groupBy(col("source").cast("string").as("source"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("obj") === col("gold_obj"), 1L).otherwise(0L)).as("c"))
      .collect()
      .map { r =>
        val a = (r.getLong(2) + 1).toDouble / (r.getLong(1) + 2)
        r.getString(0) -> Math.round(Math.log(a / (1 - a)) * 1e6)
      }.toMap
  }

  /** Reliability-weighted truth discovery — the step up from
    * [[majorityVote]] when sources are NOT equally trustworthy (Dong &
    * Srivastava's data-fusion survey; Li et al. VLDB 2013): each object's
    * support is the SUM of its backing sources' log-odds weights, so two
    * correlated coin-flip sources agreeing on a wrong value (combined
    * weight ~0) lose to one reliable dissenter — the exact failure mode
    * unweighted voting cannot escape.
    *
    * Output one row per `(subj, pred)` item:
    * `(subj, pred, obj, n_votes, score_micro, flipped)` where `obj` is the
    * weighted winner (ties broken by the smallest object), `score_micro`
    * its exact integer weight sum, and `flipped` whether the weighted
    * winner differs from what unweighted majority vote would have picked.
    *
    * Scale shape: identical to [[majorityVote]] — one claim-collapsing
    * exchange (the weight lookup is a broadcast-free literal map), then
    * one exchange keyed by the fact item feeding both window passes
    * (weighted rank and unweighted winner share the partition sort).
    * Sources absent from the calibration map vote with weight 0, the
    * uninformative Bayes prior.
    */
  def weightedVote(claims: DataFrame, weightsMicro: Map[String, Long]): DataFrame = {
    val votes = claims.select("subj", "pred", "obj", "source").distinct()
      .withColumn("w", coalesce(
        element_at(typedLit(weightsMicro), col("source").cast("string")),
        lit(0L)))
    val scored = votes.groupBy("subj", "pred", "obj")
      .agg(count(lit(1)).as("n_votes"), sum(col("w")).as("score_micro"))
    val item = Window.partitionBy("subj", "pred")
    val byScore = item.orderBy(col("score_micro").desc, col("obj").asc)
    val byVotes = item.orderBy(col("n_votes").desc, col("obj").asc)
    scored
      .withColumn("vote_winner", first(col("obj")).over(byVotes))
      .withColumn("rn", row_number().over(byScore))
      .filter(col("rn") === 1)
      .select(col("subj"), col("pred"), col("obj"), col("n_votes"),
        col("score_micro"),
        (col("obj") =!= col("vote_winner")).as("flipped"))
  }

  /** Resolve each `(subj, pred)` item to one canonical object by
    * majority vote over distinct source claims.
    *
    * Input `(subj, pred, obj, source)`; re-assertions of the same claim
    * by the same source are collapsed first, so a chatty source cannot
    * outvote the others. Output one row per `(subj, pred)`:
    * `(subj, pred, obj, n_votes, n_claims, unanimous)` where `n_votes`
    * counts the distinct sources backing the winning object, `n_claims`
    * the distinct `(source, obj)` claims on the item (equals the source
    * count when every source asserts a single object), and `unanimous`
    * is `n_votes == n_claims`.
    *
    * Scale shape: one exchange collapses claims (keyed by the full
    * claim, map-side combined — the vote count per object falls out of
    * the same aggregation), then one window over `(subj, pred)` picks
    * the winner and sums `n_claims` in the same partition pass. Hot
    * subjects cannot skew the window: its partition key is the fact
    * item, and an item carries at most one row per (source, object)
    * pair — source-count-bounded, never corpus-bounded.
    */
  /** UNSUPERVISED iterative truth discovery — the no-gold counterpart of
    * [[weightedVote]]: when no calibration subset exists, source trust
    * and claim confidence are solved for jointly by fixpoint iteration —
    * a claim is believable if trusted sources assert it, a source is
    * trustworthy if it asserts believable claims. This mutual recursion
    * on the source↔claim bipartite graph is exactly Hubs-and-Authorities,
    * which is how the truth-discovery literature frames its baseline
    * (Pasternack & Roth COLING'10 "Sums"; Yin et al.'s TruthFinder and
    * the Li et al. VLDB'13 survey iterate the same two half-steps), so
    * the implementation carries [[Hits]]' determinism contract verbatim:
    * ALL score arithmetic is exact BIGINT micros with per-half-step
    * GLOBAL max-normalization via integer division — every operand is
    * order-independent, so the result is hash-comparable across runs,
    * partitionings, and engines, and an oracle can replay the unrolled
    * rounds bit-for-bit. (Exact while no source asserts more than ~9.2e6
    * distinct claims — the `raw × 1e6` headroom of a BIGINT; beyond
    * that, pre-partition sources or rescale `One`, same bound as q135.)
    *
    * Scale shape per round: one broadcast-sized join (trust table =
    * one row per SOURCE) against the claim list, one map-side-combined
    * aggregate keyed by claim, one aggregate keyed by source (collapses
    * to the source count), two single-row max aggregates for the
    * normalizers. Claim-confidence state is `localCheckpoint`ed per
    * round ([[Hits]]/[[KCore]] lineage discipline); the trust table is
    * source-count-bounded and needs none.
    *
    * Output one winner row per `(subj, pred)` item:
    * `(subj, pred, obj, n_sources, conf_micro)`, ties broken by the
    * smallest object — [[majorityVote]]'s tie rule.
    */
  def iterativeTruthMicro(claims: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val One = 1000000L
    val c = claims.select(col("subj"), col("pred"), col("obj"),
      col("source").cast("string").as("source")).distinct().localCheckpoint()
    // empty claims would flow a NULL max normalizer into every conf/
    // trust cell silently — refuse loudly instead (the Drift.ks
    // degenerate-input discipline; the probe reads one checkpointed
    // block, not the claim lineage)
    require(!c.isEmpty, "iterativeTruthMicro needs at least one claim")
    var trust = c.select("source").distinct()
      .select(col("source"), lit(One).as("trust"))
    var conf: DataFrame = null
    (1 to rounds).foreach { _ =>
      val cRaw = c.join(trust, "source")
        .groupBy("subj", "pred", "obj").agg(sum("trust").as("raw"))
      conf = cRaw.crossJoin(cRaw.agg(max("raw").as("mx")))
        .select(col("subj"), col("pred"), col("obj"),
          expr(s"(raw * ${One}L) div mx").as("conf"))
        .localCheckpoint()
      val tRaw = c.join(conf, Seq("subj", "pred", "obj"))
        .groupBy("source").agg(sum("conf").as("raw"))
      trust = tRaw.crossJoin(tRaw.agg(max("raw").as("mx")))
        .select(col("source"), expr(s"(raw * ${One}L) div mx").as("trust"))
    }
    val ns = c.groupBy("subj", "pred", "obj")
      .agg(count(lit(1)).as("n_sources"))
    val rank = Window.partitionBy("subj", "pred")
      .orderBy(col("conf").desc, col("obj").asc)
    conf.join(ns, Seq("subj", "pred", "obj"))
      .withColumn("rn", row_number().over(rank))
      .filter(col("rn") === 1)
      .select(col("subj"), col("pred"), col("obj"), col("n_sources"),
        col("conf").as("conf_micro"))
  }

  /** DuckDB oracle: [[iterativeTruthMicro]] unrolled `rounds` times over
    * a caller-supplied claims CTE body (columns subj, pred, obj, source).
    * MATERIALIZED per round — the [[KCore.oracleSql]] inlining-blowup
    * defense. */
  def iterativeTruthOracleSql(claimsSql: String, rounds: Int): String = {
    val One = 1000000L
    val steps = (1 to rounds).map { i =>
      s"""cr$i AS MATERIALIZED (SELECT c.subj, c.pred, c.obj,
         |  sum(t.trust) AS raw FROM claims c
         |  JOIN t${i - 1} t ON t.source = c.source GROUP BY 1, 2, 3),
         | c$i AS MATERIALIZED (SELECT subj, pred, obj,
         |  raw * $One // (SELECT max(raw) FROM cr$i) AS conf FROM cr$i),
         | tr$i AS (SELECT c.source, sum(f.conf) AS raw FROM claims c
         |  JOIN c$i f ON f.subj = c.subj AND f.pred = c.pred
         |   AND f.obj = c.obj GROUP BY 1),
         | t$i AS (SELECT source,
         |  raw * $One // (SELECT max(raw) FROM tr$i) AS trust FROM tr$i)"""
        .stripMargin.replaceAll("\n", " ")
    }.mkString(", ")
    s"""WITH claims AS MATERIALIZED (SELECT DISTINCT subj, pred, obj,
       |  source::VARCHAR AS source FROM ($claimsSql)),
       | t0 AS (SELECT DISTINCT source, $One AS trust FROM claims),
       | $steps,
       | ns AS (SELECT subj, pred, obj, count(*) AS n_sources
       |  FROM claims GROUP BY 1, 2, 3)
       | SELECT subj, pred, obj, n_sources, conf::BIGINT AS conf_micro FROM (
       |  SELECT f.subj, f.pred, f.obj, ns.n_sources, f.conf,
       |   row_number() OVER (PARTITION BY f.subj, f.pred
       |    ORDER BY f.conf DESC, f.obj) AS rn
       |  FROM c$rounds f JOIN ns ON ns.subj = f.subj
       |   AND ns.pred = f.pred AND ns.obj = f.obj)
       | WHERE rn = 1""".stripMargin.replaceAll("\n", " ")
  }

  def majorityVote(facts: DataFrame): DataFrame = {
    val votes = facts.select("subj", "pred", "obj", "source").distinct()
      .groupBy("subj", "pred", "obj")
      .agg(count(lit(1)).as("n_votes"))
    val item = Window.partitionBy("subj", "pred")
    val rank = item.orderBy(col("n_votes").desc, col("obj").asc)
    votes
      .withColumn("n_claims", sum(col("n_votes")).over(item))
      .withColumn("rn", row_number().over(rank))
      .filter(col("rn") === 1)
      .select(col("subj"), col("pred"), col("obj"), col("n_votes"),
        col("n_claims"), (col("n_votes") === col("n_claims")).as("unanimous"))
  }
}
