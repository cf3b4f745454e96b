package graft

import graft.dedup.Dedup
import graft.kg.{ConnectedComponents, Kg}
import graft.ner.NerSpark
import graft.sim.Ann
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract (SURVEY.md §7 stage 5): one `queries` entry per
  * implemented operator, with equivalent DuckDB SQL in [[oracleSql]] where
  * the operator is SQL-expressible. Column names and types are aligned
  * between both sides — the driver sorts columns by name and hashes values.
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The dictionary as SQL VALUES, shared by the NER/KG oracles. */
  private val DictValues =
    """(VALUES ('TOOL','spark'),('OPERATION','hash join'),('OPERATION','table scan'),
      |('OPERATION','merge'),('OPERATION','sort'),('ACTOR','customer'),
      |('DATA','vector'),('DATA','stream'))""".stripMargin.replaceAll("\n", " ")

  private val AliasValues =
    """(VALUES ('TOOL','spark','ent:spark'),('OPERATION','hash join','ent:hash_join'),
      |('OPERATION','table scan','ent:table_scan'),('OPERATION','merge','ent:merge'),
      |('OPERATION','sort','ent:sort'),('ACTOR','customer','ent:customer'),
      |('DATA','vector','ent:vector'),('DATA','stream','ent:stream'))"""
      .stripMargin.replaceAll("\n", " ")

  /** The pipeline's post-canonicalization top-1 alias winners as SQL VALUES
    * `(alias, entity_id)` — emitted from the engine's own driver-side
    * computation ([[graft.kg.Kg.winnersPerAlias]] ∘ [[graft.kg.KgPipeline
    * .canonicalMap]] over [[graft.kg.Kg.AliasesExtended]]), so the q46
    * oracle replays the exact linking dictionary the pipeline broadcasts. */
  private def winnersValues: String = {
    val canon = graft.kg.KgPipeline.canonicalMap(graft.kg.Kg.AliasesExtended)
    graft.kg.Kg.winnersPerAlias(graft.kg.Kg.AliasesExtended)
      .map { case (a, e, _) => s"('$a', '${canon.getOrElse(e, e)}')" }
      .mkString("(VALUES ", ", ", ")")
  }

  /** The ANN LSH hyperplanes as SQL VALUES — generated from the engine's
    * own [[graft.sim.Ann.hyperplanes]] (fixed-seed PRNG) so oracle and
    * engine share the exact same doubles; `Double.toString` round-trips
    * bit-exactly through DuckDB's literal parser. */
  private def planesValues(dim: Int, nBits: Int): String =
    graft.sim.Ann.hyperplanes(dim, nBits).zipWithIndex.map { case (p, i) =>
      s"($i, [${p.mkString(",")}]::DOUBLE[])"
    }.mkString("(VALUES ", ", ", ")")

  /** The language-ID trigram profiles as SQL VALUES — generated from the
    * engine's own [[graft.quality.TextQuality.Profiles]] so oracle and
    * engine can never drift apart. */
  private val LangProfileValues: String =
    graft.quality.TextQuality.Profiles.toSeq.sortBy(_._1).flatMap { case (lang, gs) =>
      gs.toSeq.sorted.map(g => s"('$lang','$g')")
    }.mkString("(VALUES ", ",", ")")

  /** Per-document (dataset, doc_id, n_chars, n_entities, gold categories)
    * over the real BRAT corpora, as DuckDB SQL generated from the SAME
    * [[graft.sources.Brat.Corpora]] registry the engine reads — parser
    * variant quirks (`#` skip, `==3` vs `>=3` tab fields) included. */
  private def bratDocsSql: String = {
    // the Python str.strip() whitespace set
    val ws = "' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)"
    graft.sources.Brat.Corpora.map { c =>
      val hashFilter =
        if (c.variant == graft.sources.Brat.Exact3) "AND NOT contains(line, '#')" else ""
      val fieldsOp = if (c.variant == graft.sources.Brat.Exact3) "=" else ">="
      val noGold = if (c.dropNoGold) "WHERE coalesce(a.n, 0) > 0" else ""
      s"""SELECT '${c.name}' AS dataset, t.doc_id, length(t.text) AS n_chars,
         |  coalesce(a.n, 0) AS n_entities, a.cats
         | FROM (SELECT regexp_extract(filename, '([^/]+)[.]txt$$', 1) AS doc_id,
         |        trim(content, $ws) AS text
         |       FROM read_text('${c.dir}/*.txt')) t
         | LEFT JOIN (
         |  SELECT doc_id, count(*) AS n,
         |   list(string_split_regex(trim(string_split(trim(line, $ws), chr(9))[2], $ws),
         |     '\\s+')[1]) AS cats
         |  FROM (SELECT regexp_extract(filename, '([^/]+)[.]ann$$', 1) AS doc_id,
         |         unnest(string_split(content, chr(10))) AS line
         |        FROM read_text('${c.dir}/*.ann'))
         |  WHERE line LIKE 'T%' $hashFilter
         |   AND len(string_split(trim(line, $ws), chr(9))) $fieldsOp 3
         |   AND len(string_split_regex(trim(string_split(trim(line, $ws), chr(9))[2], $ws),
         |     '\\s+')) = 3
         |  GROUP BY doc_id) a USING (doc_id)
         | $noGold""".stripMargin.replaceAll("\n", " ")
    }.mkString("(", " UNION ALL ", ")")
  }

  /** q73's peel threshold — chosen so the sf0.01 parts co-occurrence graph
    * shows a real multi-round cascade (6 rounds) AND a non-empty core
    * (k=90 empties it; k=70 barely peels). */
  private val KCoreK = 80

  /** q75's wedge-center cap percentile and support threshold. The cap is
    * DATA-RELATIVE (the p75 exact degree percentile, measured per sf dir
    * and memoized like q73's peel depth): a fixed constant is tuned to one
    * graph density and at another scale factor either admits every hub or
    * excludes everything — "skip the densest quartile of centers" holds at
    * any density. The static-oracle fallback keeps the former constant
    * 150 (≈ the sf0.01 p75); [[oracleSqlFor]] inlines the measured cap.
    * Support 16 keeps the sf0.01 proposal list at ~4.5k pairs. */
  private val LinkPredHubPct = 0.75
  private val LinkPredHubCapStatic = 150L
  private val LinkPredMinCommon = 16L

  /** q75's engine-measured degree-percentile cap per sf dir ([[KCoreRoundsMemo]]'s
    * pattern): recorded when the query runs so the oracle replays the same
    * bound without re-measuring. */
  private val LinkPredCapMemo =
    scala.collection.concurrent.TrieMap.empty[String, Long]

  /** q122's holdout split: bucket 0 of 10 (≈10% of edges held out) on the
    * shared md5 primitive, so the oracle re-derives the identical split —
    * the q47/q56/q57 discipline applied to the evaluation protocol. */
  private val LinkPredEvalMod = 10
  private val LinkPredEvalBucket = 0

  /** q95's engine-measured decile cutpoints per sf dir — shared by the
    * query lambda and [[oracleSqlFor]] so both sides bin with the SAME
    * measured values (two independent measurements could differ in the
    * last bit and flip a boundary doc). */
  private val PerplexityCutsMemo =
    scala.collection.concurrent.TrieMap.empty[String, Seq[Double]]

  /** q97's stored-labeling cache version: bump whenever
    * [[partsCooccurEdges]], the 80/20 split rule, or
    * [[graft.kg.ConnectedComponents.runStar]]'s output could change —
    * the cache key's mtime+size half only tracks the DATA. */
  private val CcLabelsVer = 1

  /** q100's declared `rdfs:domain` per predicate. `performs` is
    * DELIBERATELY declared against the wrong hierarchy branch (its
    * subjects are OPERATION ⊑ Event, not Agent), so the audit has a real
    * planted modeling error to surface; the other three declarations are
    * consistent and must yield zero rows. */
  private val PredDomains = Seq(
    "uses_tool" -> "Artifact", "performs" -> "Agent",
    "involves" -> "Agent", "consumes" -> "Artifact")

  private val PredDomainsValues = PredDomains
    .map { case (p, c) => s"('$p','$c')" }
    .mkString("(VALUES ", ", ", ")")

  /** q99's stop-shingle cap (15% of the corpus, integer math — exact in
    * both engines) and overlap threshold: at sf0.01 the cap keeps the
    * typical shingle (df ≈ 28 of 500 docs) while the threshold isolates
    * the 25 planted near-dup pairs; both knobs are corpus-relative. */
  private val ContainDfPct = 15L
  private val ContainMinOverlap = 0.7

  /** q89's fixed synchronous label-propagation round count: 3 rounds on
    * the dense sf parts graph reaches label agreement on the giant
    * community while the oracle unroll stays 3 CTE rounds. */
  private val LabelPropRounds = 3

  /** q92's personalized-PageRank iteration count — 5 rounds spreads seed
    * mass past the 3-hop BFS horizon (q60) while the oracle unroll stays
    * linear-size. */
  private val PprIters = 5

  /** q76's inactivity gap (8h): the sf event stream's median inter-event
    * gap is ~7.3h, so this splits users into a real mix of session sizes
    * instead of all-singletons or one-session-per-user. */
  private val SessionGapS = 28800L

  /** q78's single-valued predicate declarations (the OWL
    * FunctionalProperty set the audit enforces). */
  private val FunctionalPreds = Seq("uses_tool", "consumes")

  /** The same set as a SQL IN-list body, so engine and oracle share it. */
  private val FunctionalPredsSql = FunctionalPreds.map(p => s"'$p'").mkString(", ")

  /** q101's second extractor vocabulary: the rename map extractor B
    * emits its predicates under. ONE definition feeds both the Spark
    * rename expression and the oracle's CASE so they cannot drift. */
  private val PredAliases = Seq(
    "uses_tool" -> "tool_used", "performs" -> "op_performed",
    "involves" -> "actor_of", "consumes" -> "data_read")

  /** [[PredAliases]] as a SQL CASE over column `pred` — predicates
    * outside the map fall through UNCHANGED (a grown vocabulary must
    * survive the rename, not collapse to NULL). */
  private val PredAliasCase = PredAliases
    .map { case (a, b) => s"WHEN '$a' THEN '$b'" }
    .mkString("CASE pred ", " ", " ELSE pred END")

  /** [[PredAliases]] as a Catalyst when-chain over column `pred`, same
    * keep-unknown fall-through as [[PredAliasCase]]. */
  private def predAliasExpr: Column = PredAliases.tail
    .foldLeft(when(col("pred") === PredAliases.head._1,
      lit(PredAliases.head._2))) {
      case (e, (a, b)) => e.when(col("pred") === a, lit(b))
    }.otherwise(col("pred"))

  /** q102's fused-corruption parameters: each of the three sources
    * mis-extracts the nation fact on its own residue class mod 7, so
    * every subject keeps a 2-of-3 majority and the vote provably
    * recovers the clean fact (asserted by the spec, measured by the
    * oracle). */
  private val FusionSources = 3
  private val FusionCorruptMod = 7

  /** q105's alignment-acceptance threshold — shared by the engine merge
    * and the oracle replay. The two-thirds doc splits make a true rename
    * pair's Jaccard ≈ 1/3, while spurious pairs need genuinely shared
    * facts to reach 0.2 at all. */
  private val MergeMinJaccard = 0.2

  /** q107's held-out alias surfaces: dropped from the linking dictionary
    * so the miner has genuinely-unlinked mentions to bootstrap from; the
    * spec asserts the mined winners agree with what the full dictionary
    * would have linked. */
  private val MinedSurfaces = Set("vector", "stream")

  /** [[graft.kg.Kg.Aliases]] minus [[MinedSurfaces]] as SQL VALUES
    * `(alias, entity_id)` — one definition derives both the engine's
    * reduced dictionary and the oracle's, so they cannot drift. */
  private val ReducedAliasValues = graft.kg.Kg.Aliases
    .filterNot { case (s, _, _) => MinedSurfaces(s) }
    .map { case (s, e, _) => s"('$s','$e')" }
    .mkString("(VALUES ", ", ", ")")

  /** q107's mining thresholds: support ≥ 3 co-occurring docs survives
    * sf0.001 (~60 docs), and confidence ≥ 0.25 provably filters — the
    * rarest linked entities co-occur with the held-out surfaces on well
    * under a quarter of their pages at every sf. */
  private val MineMinSupport = 3L
  private val MineMinConf = 0.25

  /** q109's held-out entities: stripped from the typed table so the
    * usage voter has genuinely-untyped subjects. `ent:sort` keeps three
    * typed OPERATION peers (its `performs` vote stays crisp); dropping
    * `ent:customer` leaves `involves` with NO typed user, so it can only
    * be typed through the mixed co-occurrence votes — the noisy-vote
    * regime SDType exists for. */
  private val UsageHeldOut = Seq("ent:sort", "ent:customer")

  private val UsageHeldOutIn =
    UsageHeldOut.map(e => s"'$e'").mkString("(", ", ", ")")

  /** q112's rule-mining floors: support ≥ 5 distinct groundings survives
    * sf0.001 for the co-occurrence rules (the co graph is dense at every
    * sf), and confidence ≥ 0.05 keeps the cross-predicate
    * `cooccurs ∧ consumes ⇒ consumes` family whose confidence is the
    * page-overlap share — well under the transitivity rules' — while
    * still provably pruning (the mined table would otherwise carry every
    * zero-signal `(·,·,head)` combination the support join surfaces). */
  private val RuleMinSupport = 5L
  private val RuleMinConf = 0.05

  /** q113's acceptance floor: only the co-occurrence transitivity rule
    * clears 0.8 at every sf (0.875 at sf0.01; the cross-predicate
    * page-overlap rules sit at 0.10–0.25), so the applied rule set is
    * stable across scales. */
  private val RuleApplyMinConf = 0.8

  /** q116's co-purchase graph: the ≥ 2-shared-orders floor keeps the
    * parts DAG sparse at every sf (measured: 2.3–3.6k edges, ≤ 12k
    * 2-hop pairs across sf0.001–sf0.1), so the 3-hop closure stays
    * neighborhood-sized — the bound the closure scaladoc tells users
    * to pick. */
  private val Q116MinOrders = 2L
  private val Q116MaxHops = 3

  /** q104's reliability construction: sources 0 and 1 are a CORRELATED
    * coin-flip pair (both corrupt every suppkey ≡ 0 mod [[Q104PairMod]]
    * the same way — the failure mode unweighted majority cannot escape),
    * source 2 is a 95%-reliable solo (corrupts only mod [[Q104SoloMod]]);
    * the calibration gold is the true facts on the
    * `suppkey % [[Q104GoldMod]] < [[Q104GoldKeep]]` subset. */
  private val Q104PairMod = 2
  private val Q104SoloMod = 20
  private val Q104GoldMod = 10
  private val Q104GoldKeep = 3
  /** q104's construction is structurally THREE-source (the pair + the
    * solo) — its own constant, NOT q102's tunable [[FusionSources]],
    * so retuning q102 cannot silently desynchronize q104's oracle. */
  private val Q104Sources = 3

  /** The q104 claim stream as a SQL body (columns subj, pred, obj,
    * source) — shared by q104's inline oracle and q147's static
    * truth-discovery oracle so the two replays read ONE derivation. */
  private lazy val FusionClaimsBodySql =
    s"""SELECT 's_' || s_suppkey AS subj, 'in_nation' AS pred,
       | 'n_' || (CASE WHEN g.k <= 1 AND s_suppkey % $Q104PairMod = 0
       |   THEN (s_nationkey + 1) % 25
       |  WHEN g.k = 2 AND s_suppkey % $Q104SoloMod = 0
       |   THEN (s_nationkey + 2) % 25
       |  ELSE s_nationkey END) AS obj,
       | g.k AS source
       | FROM supplier CROSS JOIN generate_series(0, ${Q104Sources - 1}) g(k)"""
      .stripMargin.replaceAll("\n", " ")

  /** q104's claim stream: per-source corruption per the constants above.
    * Shared by the query, the weight calibration, and (via the same
    * constants) the oracle SQL, so the three cannot drift. */
  private def weightedFusionClaims(s: SparkSession, dir: String): DataFrame = {
    val sup = t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    def src(corrupt: Column, delta: Int, k: Int): DataFrame = sup.select(
      concat(lit("s_"), col("s_suppkey").cast("string")).as("subj"),
      lit("in_nation").as("pred"),
      concat(lit("n_"),
        when(corrupt, (col("s_nationkey") + delta) % 25)
          .otherwise(col("s_nationkey")).cast("string")).as("obj"),
      lit(k).as("source"))
    src(col("s_suppkey") % Q104PairMod === 0, 1, 0)
      .union(src(col("s_suppkey") % Q104PairMod === 0, 1, 1))
      .union(src(col("s_suppkey") % Q104SoloMod === 0, 2, 2))
  }

  /** q104's calibration gold: the TRUE facts on the deterministic subset. */
  private def weightedFusionGold(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "supplier")
      .filter(col("s_suppkey") % Q104GoldMod < Q104GoldKeep)
      .select(
        concat(lit("s_"), col("s_suppkey").cast("string")).as("subj"),
        lit("in_nation").as("pred"),
        concat(lit("n_"), col("s_nationkey").cast("string")).as("obj"))

  /** q104's engine-measured source weights per sf dir — micro-log-odds
    * longs, inlined into the oracle (the q42/q73/q95 measured-literals
    * pattern) so no transcendental is ever recomputed cross-engine. */
  private val FusionWeightsMemo =
    scala.collection.concurrent.TrieMap.empty[String, Map[String, Long]]
  private def q104Weights(s: SparkSession, dir: String): Map[String, Long] =
    FusionWeightsMemo.getOrElseUpdate(dir, graft.kg.Fusion.sourceWeightsMicro(
      weightedFusionClaims(s, dir), weightedFusionGold(s, dir)))

  /** q79's sorted-neighborhood width and edit-distance ceiling: the dirty
    * variants sort within 1–2 ranks of their clean record, and both dirt
    * modes are ≤ 1 edit away. */
  private val ErWindow = 4
  private val ErMaxDist = 2

  /** q80's declared class hierarchy (direct subClassOf edges): a diamond-
    * free depth-2 tree over the four extraction categories, so the
    * closure genuinely ADDS edges (TOOL ⊑ Thing etc.) beyond the
    * declarations. */
  private val ClassHierarchy = Seq(
    "TOOL" -> "Artifact", "DATA" -> "Artifact",
    "OPERATION" -> "Event", "ACTOR" -> "Agent",
    "Artifact" -> "Thing", "Event" -> "Thing", "Agent" -> "Thing")

  private val ClassHierarchyValues = ClassHierarchy
    .map { case (c, p) => s"('$c','$p')" }
    .mkString("(VALUES ", ", ", ")")

  /** q132's per-label audit worklist size: 5 of each synthetic label's
    * 50–200 vectors — a review queue, not a re-clustering. */
  private val OutlierK = 5

  /** q135's HITS rounds: 3 full (authority, hub) updates — enough for
    * the bipartite grounding graph's scores to separate (the 2-hop
    * co-grounding signal propagates once each way per round) while the
    * unrolled oracle CTE chain stays readable. */
  private val HitsIters = 3

  /** q126's per-(subj, pred) object cap: small enough that the hub
    * entities' doc-grounded fact lists truncate at EVERY sf (visible
    * `,…` path) while the ≤ 7-entity co-occurrence lists never do —
    * both linearization branches exercised on every corpus. */
  private val LinearizeCap = 8

  /** q123's declared cardinality shapes `(type, pred, min, max)`. Chosen
    * so every violation path fires on the synthetic corpora: tight max
    * bounds on the doc-grounded predicates (frequent entities overflow),
    * a min bound on `cooccurs_with` (lonely entities underflow), and one
    * shape on a predicate its type NEVER carries (ACTOR × uses_tool) so
    * the n_obj = 0 left-join default is exercised, not just declared. */
  private val ShapeDecls: Seq[(String, String, Long, Long)] = Seq(
    ("TOOL", "uses_tool", 1L, 5L),
    ("OPERATION", "cooccurs_with", 3L, 6L),
    ("ACTOR", "involves", 1L, 10L),
    ("ACTOR", "uses_tool", 1L, 5L),
    ("DATA", "consumes", 2L, 1000000L))

  private val ShapeValues = ShapeDecls
    .map { case (t, p, lo, hi) => s"('$t','$p',${lo}::BIGINT,${hi}::BIGINT)" }
    .mkString("(VALUES ", ", ", ")")

  /** q83's inter-mention character gap: 40 chars keeps contexts at
    * phrase length (the distant-supervision window) while the synthetic
    * docs still produce a real pattern vocabulary. */
  private val RelCtxMaxGap = 40

  /** q85's synthesized crawl-timestamp base (2023-11-14T22:13:20Z) —
    * deterministic, like q68's synthesized URLs. */
  private val CrawlEpochBase = 1700000000L

  /** q86's walk shape: 2 walks per node × 4 hops — enough that every
    * node contributes multiple contexts while the oracle unroll stays
    * 4 CTE rounds. */
  private val WalksPerNode = 2
  private val WalkSteps = 4

  /** q73/q75's canonical-edge derivation (the q53/q60 parts co-occurrence
    * graph) as SQL — shared by the static and round-adaptive oracles. */
  private val KCoreEdgesSql =
    """SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      | FROM lineitem a JOIN lineitem b
      | ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"""
      .stripMargin.replaceAll("\n", " ")

  /** q144/q145 shared oracle CTEs: the [[landmarkEdges]] derivation
    * (thinned undirected graph), the 4-smallest-node seed set, and the
    * seed-keyed bounded-BFS recursion down to `mind (seed, node, dist)`
    * — min hop count per pair, the multi-source frame both aggregates
    * read. One definition so the two replays cannot drift. */
  private val LandmarkBfsCtes =
    """li AS (SELECT l_orderkey, l_partkey FROM lineitem
      |  WHERE l_partkey % 5 = 0),
      | pairs AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
      |   AND a.l_partkey < b.l_partkey),
      | canon AS MATERIALIZED (SELECT u, v FROM (SELECT u, v,
      |   ('0x' || substr(md5(u::varchar || '|' ||
      |    v::varchar), 1, 8))::BIGINT % 10 AS h FROM pairs)
      |  WHERE h < 2),
      | edges AS (SELECT u, v FROM canon
      |  UNION ALL SELECT v AS u, u AS v FROM canon),
      | seeds AS (SELECT node FROM (SELECT u AS node FROM canon
      |  UNION SELECT v FROM canon) ORDER BY node LIMIT 4),
      | bfs(seed, node, dist) AS (SELECT node, node, 0::BIGINT FROM seeds
      |  UNION SELECT b.seed, e.v, b.dist + 1 FROM bfs b
      |   JOIN edges e ON e.u = b.node WHERE b.dist < 6),
      | mind AS (SELECT seed, node, min(dist) AS dist FROM bfs
      |  GROUP BY seed, node)"""
      .stripMargin.replaceAll("\n", " ")

  /** q151/q152 shared oracle CTEs appended after [[LandmarkBfsCtes]]:
    * the [[weightedLandmarkEdges]] derivation (canonical edges + the
    * md5-mod-9 weight) and its symmetric closure — one definition so
    * the SSSP and MSF replays read the identical weighted graph. */
  private val WeightedEdgeCtes =
    """wcanon AS MATERIALIZED (SELECT u, v,
      |  1 + ('0x' || substr(md5(u::varchar || '|' ||
      |   v::varchar), 1, 8))::BIGINT % 9 AS w FROM canon),
      | wsym AS (SELECT u, v, w FROM wcanon
      |  UNION ALL SELECT v AS u, u AS v, w FROM wcanon)"""
      .stripMargin.replaceAll("\n", " ")

  /** q151/q165 shared oracle CTEs appended after [[WeightedEdgeCtes]]:
    * the bounded weighted-walk recursion down to `best (node, dist,
    * seed)` — the (dist, seed) semiring fixpoint both queries read. */
  private val SsspBestCtes =
    """walk(seed, node, dist, hops) AS (
      |  SELECT node, node, 0::BIGINT, 0 FROM seeds
      |  UNION SELECT wa.seed, e.v, wa.dist + e.w, wa.hops + 1
      |   FROM walk wa JOIN wsym e ON e.u = wa.node WHERE wa.hops < 6),
      | bestd AS (SELECT node, min(dist) AS dist FROM walk GROUP BY node),
      | best AS (SELECT b.node, b.dist, min(wa.seed) AS seed FROM bestd b
      |  JOIN walk wa ON wa.node = b.node AND wa.dist = b.dist
      |  GROUP BY b.node, b.dist)"""
      .stripMargin.replaceAll("\n", " ")

  /** The [[landmarkEdges]] twin as one self-contained nested subquery,
    * for oracle builders that take a standalone edges SQL. */
  private lazy val LandmarkCanonSql =
    s"""SELECT u, v FROM (SELECT u, v,
       |  ('0x' || substr(md5(u::varchar || '|' ||
       |   v::varchar), 1, 8))::BIGINT % 10 AS h
       | FROM ($Mod5CooccurSql)) WHERE h < 2"""
      .stripMargin.replaceAll("\n", " ")

  /** q166's standalone weighted-edge derivation (the
    * [[weightedLandmarkEdges]] twin as one nested subquery, for oracle
    * builders that need a self-contained edges SQL). */
  private lazy val WeightedLandmarkEdgesSql =
    s"""SELECT u, v, 1 + ('0x' || substr(md5(u::varchar || '|' ||
       |  v::varchar), 1, 8))::BIGINT % 9 AS w
       | FROM ($LandmarkCanonSql)"""
      .stripMargin.replaceAll("\n", " ")

  /** q158/q173 shared whole-corpus HLL replay: registers from the
    * 60-bit md5 hash (bucket = low 6 bits, rank = highest-set-bit of
    * the rest, capped 31), harmonic fold and estimate as exact
    * BIGINTs. q173 merges two shard sketches and checks against THIS
    * — the merge-law proof. */
  private lazy val HllTokensSql =
    s"""WITH tl AS (SELECT list_filter(string_split_regex(trim(text),
       |   '\\s+'), x -> x <> '') AS l FROM documents),
       | tok AS (SELECT unnest(l) AS tok FROM tl),
       | hx AS (SELECT ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
       |  FROM tok),
       | rg AS (SELECT h % 64 AS bucket,
       |   least(31, 55 - length(bin(h // 64)))::BIGINT AS rk FROM hx),
       | reg AS (SELECT bucket, max(rk) AS register FROM rg
       |  GROUP BY bucket),
       | fb AS (SELECT g.b::BIGINT AS bucket,
       |   coalesce(reg.register, 0)::BIGINT AS register
       |  FROM generate_series(0, 63) g(b)
       |  LEFT JOIN reg ON reg.bucket = g.b),
       | sm AS (SELECT sum((2 ** (31 - register))::BIGINT)::BIGINT AS s
       |  FROM fb)
       | SELECT fb.bucket, fb.register,
       |  ((${graft.quality.Hll.AlphaMicro}::BIGINT * 4096 * 2147483648)
       |    // sm.s)::BIGINT AS est_micro
       | FROM fb CROSS JOIN sm""".stripMargin.replaceAll("\n", " ")

  /** q138/q150 shared oracle CTEs: the [[sccEdges]] derivation, the
    * bounded transitive-closure recursion, and the mutual-reachability
    * labeling down to `scc (node, scc)` — one definition so the SCC
    * query and its condensation replay the identical labels. */
  private val SccOracleCtes =
    """li AS (SELECT l_orderkey, l_partkey FROM lineitem
      |  WHERE l_partkey % 5 = 0),
      | pairs AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
      |   AND a.l_partkey < b.l_partkey),
      | ed AS MATERIALIZED (SELECT
      |   CASE WHEN h % 2 = 0 THEN u ELSE v END AS src,
      |   CASE WHEN h % 2 = 0 THEN v ELSE u END AS dst
      |  FROM (SELECT u, v, ('0x' || substr(md5(u::varchar || '|' ||
      |    v::varchar), 1, 8))::BIGINT % 10 AS h FROM pairs)
      |  WHERE h < 2),
      | reach(src, dst) AS (SELECT src, dst FROM ed
      |  UNION SELECT r.src, e.dst FROM reach r JOIN ed e ON e.src = r.dst),
      | nodes AS (SELECT src AS node FROM ed UNION SELECT dst FROM ed),
      | mut AS (SELECT r1.src AS v, r1.dst AS u FROM reach r1
      |  JOIN reach r2 ON r2.src = r1.dst AND r2.dst = r1.src),
      | scc AS (SELECT n.node,
      |   least(n.node, coalesce(min(m.u), n.node)) AS scc
      |  FROM nodes n LEFT JOIN mut m ON m.v = n.node GROUP BY n.node)"""
      .stripMargin.replaceAll("\n", " ")

  /** q43/q72 shared hashed-TF replay: the full featurization pipeline
    * (tokenize → term counts → md5 scatter with ±1 sign → dense 64-dim →
    * L2 norm) as CTEs; q43 emits the cells, q72 dots them with the
    * classifier weights. One definition so feature and gate cannot drift. */
  private val HashedTfCtes =
    """toks AS (SELECT doc_id,
      |   unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents),
      | tc AS (SELECT doc_id, tok, count(*) AS n FROM toks GROUP BY doc_id, tok),
      | h AS (SELECT doc_id,
      |   (('0x' || substr(md5(tok),1,8))::BIGINT % 64) AS idx,
      |   CASE WHEN (md5_number_lower(tok) & 1) = 1 THEN 1 ELSE -1 END AS sgn,
      |   n FROM tc),
      | cell AS (SELECT doc_id, idx, sum(sgn * n)::double AS raw
      |          FROM h GROUP BY doc_id, idx),
      | dense AS (SELECT d.doc_id, g.j, coalesce(c.raw, 0.0) AS raw
      |  FROM (SELECT DISTINCT doc_id FROM documents) d
      |  CROSS JOIN generate_series(0, 63) g(j)
      |  LEFT JOIN cell c ON c.doc_id = d.doc_id AND c.idx = g.j),
      | nrm AS (SELECT doc_id, sqrt(sum(raw * raw)) AS n2
      |         FROM dense GROUP BY doc_id)""".stripMargin.replaceAll("\n", " ")

  private val PredCase =
    """CASE category WHEN 'TOOL' THEN 'uses_tool' WHEN 'OPERATION' THEN 'performs'
      | WHEN 'ACTOR' THEN 'involves' WHEN 'DATA' THEN 'consumes' END"""
      .stripMargin.replaceAll("\n", " ")

  /** Flagship: the full KG pipeline (extract → link → triples) on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    kgTriples(spark, "/root/testdata/sf0.001")

  private def kgMentions(spark: SparkSession, dir: String): DataFrame =
    NerSpark.mentions(spark, t(spark, dir, "documents"))

  /** q118/q157's measurement corpus: every document with four planted
    * mixed-format quantities appended — ONE definition (mirrored in
    * [[measurementsSql]]) so extraction and the SPARQL numeric
    * aggregates read the same literals. */
  private def plantedMeasurementDocs(s: SparkSession, dir: String): DataFrame = {
    val planted = concat(col("text"),
      lit(" dist 1,"), lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
      lit(" km mass "), (col("doc_id") % 90).cast("string"),
      lit(".5 kg took "), (col("doc_id") % 250).cast("string"),
      lit("ms len "), (col("doc_id") % 40).cast("string"), lit(" m"))
    t(s, dir, "documents").select(col("doc_id"), planted.as("text"))
  }

  private def kgTriples(spark: SparkSession, dir: String): DataFrame = {
    val linked = Kg.disambiguate(Kg.candidates(kgMentions(spark, dir), Kg.aliasDf(spark)))
    // localCheckpoint: the SPARQL/BGP consumers scan the triple store once
    // per pattern leg and the iterative consumers once per job — each scan
    // would otherwise re-run the whole extraction+linking lineage (the
    // NER segmentation + grounding pass), which no exchange-reuse can
    // deduplicate across pattern filters. The store is triple-count-sized
    // (~24k rows at sf0.1) — block residency is effectively free.
    Kg.triples(linked, NerSpark.Predicates).localCheckpoint()
  }

  /** Per-doc entity co-occurrence facts over a linked frame: ordered
    * distinct entity pairs sharing a page as `(subj, cooccurs_with,
    * obj)` — the entity–entity edges q109/q112/q113 union onto the
    * doc-grounded KG (ONE definition so their oracles replay the same
    * construction). */
  private def cooccurFacts(linked: DataFrame): DataFrame = {
    val ents = linked.select(col("doc_id"), col("entity_id")).distinct()
    ents.as("a")
      .join(ents.as("b"), col("a.doc_id") === col("b.doc_id") &&
        col("a.entity_id") =!= col("b.entity_id"))
      .select(col("a.entity_id").as("subj"),
        lit("cooccurs_with").as("pred"), col("b.entity_id").as("obj"))
      .distinct()
  }

  /** The q53/q60/q73/q75 parts co-occurrence graph: canonical (u<v,
    * distinct) edges between parts sharing an order — ONE definition so
    * the graph queries and the round-measuring oracle path cannot
    * diverge (its SQL twin is [[KCoreEdgesSql]]). */
  private def partsCooccurEdges(spark: SparkSession, dir: String): DataFrame =
    // localCheckpoint: every consumer is a multi-job graph algorithm
    // (fixpoint loops, measured-gate probes) — without it each job
    // re-runs the lineitem self-join + distinct, since exchange reuse
    // only deduplicates subtrees WITHIN one job (guide §2.4; measured
    // across q53..q98 in OPTIMIZATION_r06). |E| is O(graph), ~20 MB at
    // sf0.1 — block-store residency is the cheap side of the trade.
    partsCooccurEdgesRaw(spark, dir).localCheckpoint()

  /** [[partsCooccurEdges]] WITHOUT the checkpoint — for consumers whose
    * operator persists the derived graph internally at its first
    * reference ([[graft.kg.Triangles.orientedOf]]): q53 and q88 build
    * the IDENTICAL canonicalized plan from this helper, so the session
    * CacheManager resolves both persists to one cached oriented list
    * (a checkpointed input would defeat that match — every
    * localCheckpoint call is a fresh RDD leaf). */
  private def partsCooccurEdgesRaw(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem").select("l_orderkey", "l_partkey")
    val pairs = li.as("a")
      .join(li.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
    graft.kg.Triangles.canonicalEdges(pairs, "u", "v")
  }

  /** q138's directed cycle graph: parts co-occurrence pairs restricted to
    * partkeys ≡ 0 (mod 5), thinned to the 2-in-10 md5 edge bucket, and
    * oriented by that bucket's parity — gate and orientation both on the
    * shared [[graft.core.Buckets]] primitive so the DuckDB twin
    * re-derives the identical graph. The thinning is what makes SCC
    * structure RICH at verify scale (giant knot + small cycles + DAG
    * fringe — 99 SCCs over 395 nodes at sf0.01) instead of one trivial
    * all-mutual ball, and keeps the oracle's transitive closure small. */
  private def sccEdges(s: SparkSession, dir: String): DataFrame = {
    val pairs = mod5CooccurPairs(s, dir)
    val h = graft.core.Buckets.md5Bucket(concat_ws("|", col("u"), col("v")), 10)
    pairs.filter(h < 2).select(
      when(h % 2 === 0, col("u")).otherwise(col("v")).as("src"),
      when(h % 2 === 0, col("v")).otherwise(col("u")).as("dst"))
  }

  /** The mod-5-restricted parts co-occurrence graph (canonical u < v,
    * distinct) — [[sccEdges]]' base before thinning, and q148's truss
    * input: 25× fewer wedge-join rows than the full graph while keeping
    * real triangle structure (support up to ~9 at verify scale). SQL
    * twin inlined in [[Mod5CooccurSql]]. */
  private def mod5CooccurPairs(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select("l_orderkey", "l_partkey")
      .filter(col("l_partkey") % 5 === 0)
    li.as("a")
      .join(li.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
      // localCheckpoint: q138/q150/q153/q174 run the SCC machinery — many
      // jobs, each of which would otherwise re-run this self-join
      // (partsCooccurEdges' rationale; the derived sccEdges projection on
      // top is narrow and cheap to re-run per reference)
      .localCheckpoint()
  }

  private val Mod5CooccurSql =
    """SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      | FROM (SELECT l_orderkey, l_partkey FROM lineitem
      |   WHERE l_partkey % 5 = 0) a
      | JOIN (SELECT l_orderkey, l_partkey FROM lineitem
      |   WHERE l_partkey % 5 = 0) b
      | ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"""
      .stripMargin.replaceAll("\n", " ")

  /** q148's truss tightness: support ≥ 2 (k−2) — deep enough to peel a
    * real cascade at verify scale, shallow enough that the truss keeps
    * a majority backbone. */
  private val KTrussK = 4

  /** q161's filter width: small enough that deterministic false
    * positives actually appear at verify scale (the interesting rows),
    * large enough that the pass set stays selective. */
  private val BloomBits = 4096

  /** q148's engine-measured peel depth per sf dir — the [[KCoreRoundsMemo]]
    * contract for the truss. */
  private val KTrussRoundsMemo =
    scala.collection.concurrent.TrieMap.empty[String, Int]

  /** q171's engine-measured Luby round count per sf dir — same memo
    * contract; extra unrolled rounds are idempotent (empty winner sets
    * change nothing), fewer are not. */
  private val MisRoundsMemo =
    scala.collection.concurrent.TrieMap.empty[String, Int]

  /** q175's strength threshold — picked by SIMULATING the peel at
    * sf0.01: 18 survives 148 nodes after a 14-round cascade (20 empties
    * the graph, 16 barely cascades), so the fixpoint exercises a real
    * cascade AND keeps a core. Measured-round memo beside it. */
  private val SCoreS = 18L
  private val SCoreRoundsMemo =
    scala.collection.concurrent.TrieMap.empty[String, Int]

  /** q144/q145's landmark graph: [[sccEdges]]' thinned derivation kept
    * UNDIRECTED (canonical u < v, no parity orientation) — the same
    * mod-5 + 2-in-10 md5 thinning that gives the graph long paths and a
    * DAG fringe instead of one dense ball, so bounded distances carry
    * information at verify scale. ONE derivation shared by both queries
    * and mirrored verbatim in their oracle CTEs. */
  private def landmarkEdges(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select("l_orderkey", "l_partkey")
      .filter(col("l_partkey") % 5 === 0)
    val pairs = li.as("a")
      .join(li.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
    pairs.filter(
      graft.core.Buckets.md5Bucket(concat_ws("|", col("u"), col("v")), 10) < 2)
      // localCheckpoint: feeds the SSSP/MST/MIS/s-core fixpoint loops —
      // multi-job consumers, same rationale as [[partsCooccurEdges]]
      .localCheckpoint()
  }

  /** q151/q152's weighted graph: [[landmarkEdges]] with a deterministic
    * integer weight 1..9 from the shared md5 bucket of the canonical
    * endpoint pair — the SAME primitive that thinned the graph, so the
    * DuckDB twin re-derives identical weights. Totally ordered by
    * `(w, u, v)` the edge set has a UNIQUE minimum spanning forest. */
  private def weightedLandmarkEdges(s: SparkSession, dir: String): DataFrame =
    landmarkEdges(s, dir).withColumn("w",
      lit(1L) + graft.core.Buckets.md5Bucket(
        concat_ws("|", col("u"), col("v")), 9))

  /** The 4 smallest nodes of the landmark graph — a k-sized TakeOrdered,
    * deterministic, oracle-rederivable. */
  private def landmarkSeeds(canon: DataFrame): DataFrame =
    canon.select(col("u").as("node"))
      .union(canon.select(col("v").as("node")))
      .distinct().orderBy(col("node")).limit(4)

  /** q79/q125's ER record set: clean customer names + a deterministic
    * 1-edit dirty twin per record (trailing space for even keys, doubled
    * last character for odd — SUFFIX dirt, so each dirty record sorts
    * within a rank or two of its clean twin). ONE definition so the
    * matcher (q79) and its evaluation (q125) read the same records. */
  private def erRecords(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").select(col("c_custkey"), col("c_name"))
    val clean = c.select((col("c_custkey") * 2).as("rec_id"),
      col("c_name").as("key"))
    val dirty = c.select((col("c_custkey") * 2 + 1).as("rec_id"),
      when(col("c_custkey") % 2 === 0, concat(col("c_name"), lit(" ")))
        .otherwise(concat(col("c_name"), substring(col("c_name"), -1, 1)))
        .as("key"))
    clean.union(dirty)
  }

  /** q73's engine-measured peel depth per sf dir, recorded when the query
    * runs so [[oracleSqlFor]] need not re-run the whole peel. */
  private val KCoreRoundsMemo =
    scala.collection.concurrent.TrieMap.empty[String, Int]

  /** The q116/q120 repeat co-purchase DAG: parts sharing ≥
    * [[Q116MinOrders]] orders, directed u < v — ONE definition (SQL twin
    * [[CopurchaseEdgesCtes]]) so the closure and reduction queries read
    * the same graph. */
  private def copurchaseEdges(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select("l_orderkey", "l_partkey").distinct()
    li.as("a")
      .join(li.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("subj"), col("b.l_partkey").as("obj"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= Q116MinOrders)
      .select(col("subj"), lit("copurchase").as("pred"), col("obj"))
    // NO localCheckpoint here: every consumer (closure's persist,
    // transitiveReduction's persist, Dag's own localCheckpoint) already
    // materializes the DAG at its first reference, so an eager
    // checkpoint at this level only adds a blocking extra pass —
    // measured +2 s on q116 and q120 in OPTIMIZATION_r06.
  }

  /** [[copurchaseEdges]] as oracle CTEs (`li`, `e(u, v)`). */
  private val CopurchaseEdgesCtes =
    s"""li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       | e AS MATERIALIZED (SELECT a.l_partkey AS u, b.l_partkey AS v
       |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
       |   AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2 HAVING count(*) >= $Q116MinOrders)""".stripMargin

  /** q120's 2..`maxHops` simple-path CTEs, GENERATED from the same
    * [[Q116MaxHops]] constant the engine lambda passes — one definition,
    * so a constant bump re-unrolls the oracle instead of drifting the
    * twin (the [[CopurchaseEdgesCtes]] discipline). Each `p_d` carries
    * its full node sequence `(u, w1..w_{d-1}, v)` and each extension
    * bans self-loop edges and node revisits — the cycle-safe simple-path
    * semantics of `kg.TriplePatterns.transitiveReduction` (no-op guards
    * on the u<v co-purchase DAG, kept so the twin replays the operator,
    * not the special case); `multi` unions the entailed pairs. */
  private def transitiveReductionCtes(maxHops: Int): String = {
    val p2 = "p2 AS (SELECT a.u AS u, a.v AS w1, b.v AS v FROM e a" +
      " JOIN e b ON a.v = b.u WHERE a.u <> a.v AND b.u <> b.v AND b.v <> a.u)"
    val deeper = (3 to maxHops).map { d =>
      val keep = (1 to d - 2).map(i => s"p.w$i").mkString(", ")
      val guards = (1 to d - 2).map(i => s"c.v <> p.w$i").mkString(" AND ")
      s"p$d AS (SELECT p.u, $keep, p.v AS w${d - 1}, c.v AS v" +
        s" FROM p${d - 1} p JOIN e c ON p.v = c.u" +
        s" WHERE c.u <> c.v AND c.v <> p.u AND $guards)"
    }
    val multi = (2 to maxHops).map(d => s"SELECT u, v FROM p$d")
      .mkString("multi AS (", " UNION ", ")")
    (p2 +: deeper :+ multi).mkString(", ")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- relational core (SURVEY.md §2 ops 2/4/17/18/21 + joins note) ----
    "q01_filter_project" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_quantity") > 45)
        .select("l_orderkey", "l_partkey", "l_quantity")
    }),
    "q02_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_rows"))
    }),
    "q03_doc_stats" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          round(avg(col("n_chars")), 4).as("avg_chars"),
          round(stddev_pop(col("n_chars")), 4).as("std_chars"))
    }),
    "q04_rollup" -> ((s, dir) => {
      t(s, dir, "documents").rollup("lang").agg(count(lit(1)).as("n_docs"))
    }),
    "q05_broadcast_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("total_price"))
    }),
    "q06_window_top1" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    }),
    "q07_anti_join" -> ((s, dir) => {
      // resume-pattern analog (SURVEY.md §7 stage 4): rows with no
      // already-materialized counterpart survive the left-anti
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 400000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti").select("c_custkey")
    }),
    "q08_salted_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      Kg.saltedJoin(li, o, "l_orderkey", "o_orderkey",
          pmod(hash(col("l_partkey"), col("l_suppkey")), lit(8)), 8)
        .groupBy("o_orderpriority")
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_rows"))
    }),
    "q09_window_events" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(
          // ts is TIMESTAMP_NTZ; session TZ is UTC so ntz→ltz→epoch matches
          // DuckDB's epoch() on the same naive value
          (floor(col("ts").cast("timestamp").cast("long") / 300) * 300).cast("long").as("win_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("sum_value"))
    }),
    // ---- NER pipeline (SURVEY.md §2 ops 5-18) ----
    "q10_ner_mentions" -> ((s, dir) => kgMentions(s, dir)),
    "q11_ner_micro" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val m = kgMentions(s, dir)
      NerSpark.microMetrics(s, docs, m, m)
    }),
    // ---- KG construction (SURVEY.md §7 stage 3) ----
    "q12_triples" -> ((s, dir) => kgTriples(s, dir)),
    "q13_connected_components" -> ((s, dir) => {
      val docs = t(s, dir, "documents").filter(col("doc_id") % 7 === 0)
      val linked = Kg.disambiguate(
        Kg.candidates(NerSpark.mentions(s, docs), Kg.aliasDf(s)))
      val edges = linked
        .select(concat(lit("d:"), col("doc_id").cast("string")).as("src"),
          col("entity_id").as("dst"))
        .distinct()
      // the O(log²)-round star variant — validated here against the
      // DuckDB recursive-CTE oracle (and in OpsSpec against min-label CC)
      ConnectedComponents.runStar(s, edges)
    }),
    // IVF ANN (k-means coarse quantizer; the brief's alternative scale
    // path beside LSH): deterministic driver-side Lloyd's training, narrow
    // broadcast assignment, 2-cell probe, exact cosine re-rank
    "q42_ann_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toArray
      graft.sim.Ivf.ivfTopK(s, emb, q, 10, nCells = 16, iters = 5,
        nProbe = 2, sampleN = 100000)
        .select(col("vec_id"), round(col("sim"), 4).as("sim"))
    }),
    // native Catalyst expression (tier-b extension: custom Expression with
    // doGenCode, no ScalaUDF boxing): find-resume span grounding as a
    // column function; 'spark' cannot overlap itself, so the substring-scan
    // oracle equals the resume-at-end semantics on this needle
    "q44_find_all_native" -> ((s, dir) => {
      GraftSql.registerFunctions(s) // temp-function registry, idempotent
      t(s, dir, "documents")
        .select(col("doc_id"),
          explode(expr("find_all_native(text, 'spark')")).as("s"))
        .select(col("doc_id"), col("s.begin_c"), col("s.end_c"))
    }),
    // feature-hashed TF embeddings (text → vector with no model server):
    // md5-indexed ±1 scatter + L2 normalization, flattened to (doc_id, j, v)
    // scalars so the oracle compare is list-free
    "q43_hashed_tf" -> ((s, dir) =>
      graft.sim.TextVec.flattened(s, t(s, dir, "documents"), 64)),
    // fixed-iteration PageRank over the symmetrized doc↔entity graph (same
    // edge construction as q13) — iterative DataFrame loop, one dst-keyed
    // shuffle per round; oracle unrolls the identical arithmetic as chained
    // CTEs (recursive terms can't aggregate)
    "q41_pagerank" -> ((s, dir) => {
      val docs = t(s, dir, "documents").filter(col("doc_id") % 7 === 0)
      val linked = Kg.disambiguate(
        Kg.candidates(NerSpark.mentions(s, docs), Kg.aliasDf(s)))
      val fwd = linked
        .select(concat(lit("d:"), col("doc_id").cast("string")).as("src"),
          col("entity_id").as("dst"))
        .distinct()
      val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      graft.kg.PageRank.run(s, edges, 10)
    }),
    // ---- training-data ops ----
    "q14_dedup_exact" -> ((s, dir) => Dedup.exact(t(s, dir, "documents"))),
    // md5-portable hash variants so the DuckDB oracle replays the ENTIRE
    // LSH pipeline (shingle→signature→band→pair→estimate); the murmur fast
    // path shares every stage but the primitive hash and is cross-checked
    // against exact Jaccard in SparkQueriesSpec
    "q15_minhash_pairs" -> ((s, dir) =>
      Dedup.minhashPairsMd5(s, t(s, dir, "documents"), 0.1)),
    "q16_simhash" -> ((s, dir) => Dedup.simhashBits(s, t(s, dir, "documents"))),
    "q17_text_quality" -> ((s, dir) => {
      val toks = split(trim(col("text")), "\\s+")
      t(s, dir, "documents").select(
        col("doc_id"),
        size(toks).as("n_tokens"),
        size(array_distinct(toks)).as("n_distinct"),
        round(size(array_distinct(toks)).cast("double") / size(toks), 4).as("ttr"),
        round(length(regexp_replace(col("text"), " ", "")).cast("double") / size(toks), 4)
          .as("avg_word_len"))
    }),
    "q18_ann_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toArray
      Ann.bruteForceTopK(emb, q, 10)
        .select(col("vec_id"), round(col("sim"), 4).as("sim"))
    }),
    "q19_ann_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toArray
      Ann.lshTopK(s, emb, q, 10, q.length, 8)
        .select(col("vec_id"), round(col("sim"), 4).as("sim"))
    }),
    // ---- north-rule pipeline on synthesized webtext (no external data) ----
    "q20_kg_pipeline" -> ((s, _) => {
      val out = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(graft.core.TmpFs.base), "graft-q20-").toString
      val pages = graft.fixtures.WebTextGen.pages(s, 500, 8).toDF()
      graft.kg.KgPipeline.run(s, pages, graft.kg.KgPipeline.Config(out, numBuckets = 8))
      // materialize the (fixed 500-doc demo-sized) result, then delete the
      // temp output so repeated Verify/Bench invocations don't leak tmpfs
      val result = s.read.parquet(s"$out/triples").select("subj", "pred", "obj")
      val rows = result.collect()
      val schema = result.schema
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
      s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    }),
    // the flagship pipeline over the SF-DIR documents table — the input
    // DuckDB can read, so the END-TO-END pipeline path (html render →
    // extract → annotate → link → canonicalize → dedup → bucketed write)
    // gets a hash-compared oracle row, not just spec pins: pages are the
    // documents rendered through the fixture HTML shape (extract ∘ render
    // = id), urls a pure function of doc_id, and the oracle replays
    // dictionary × containment × the engine-emitted winner map
    "q46_kg_pipeline_sf" -> ((s, dir) => {
      import s.implicits._
      val out = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(graft.core.TmpFs.base), "graft-q46-").toString
      val pages = t(s, dir, "documents")
        .select(col("doc_id").cast("long"), col("text"), col("lang"))
        .as[(Long, String, String)]
        .map { case (id, text, lang) =>
          val url = s"https://docs.example/$id"
          (url, new java.sql.Timestamp(0L),
            graft.html.HtmlGen.render(url, s"doc $id", text), text, lang)
        }
        .toDF("url", "warc_ts", "html", "text", "lang")
      graft.kg.KgPipeline.run(s, pages,
        graft.kg.KgPipeline.Config(out, numBuckets = 8))
      val result = s.read.parquet(s"$out/triples").select("subj", "pred", "obj")
      val rows = result.collect()
      val schema = result.schema
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
      s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    }),
    // WARC source round-trip (self-synthesized like q20; WarcSpec pins the
    // KG-parity and byte-identity invariants — here html_ok makes the
    // byte-exactness visible per row): write a deterministic corpus as
    // WARC files — half plain, half `.warc.gz` in Common Crawl's
    // one-gzip-member-per-record shipping format — read it back through
    // the source (magic-byte format detection), compare bytes
    "q39_warc_roundtrip" -> ((s, _) => {
      import s.implicits._
      val pages = (0L until 200L).map(graft.fixtures.WebTextGen.page(_))
      val dir = java.nio.file.Files.createTempDirectory("graft-q39-")
      pages.grouped(50).zipWithIndex.foreach { case (g, i) =>
        val kv = g.map(p => p.url -> p.html)
        if (i % 2 == 0)
          java.nio.file.Files.write(dir.resolve(f"part-$i%05d.warc"),
            graft.sources.Warc.writeWarc(kv))
        else
          java.nio.file.Files.write(dir.resolve(f"part-$i%05d.warc.gz"),
            graft.sources.Warc.writeWarcGz(kv))
      }
      val got = graft.sources.Warc.responses(s, s"$dir/*.warc*")
      val expected = s.createDataset(pages.map(p => (p.url, p.html)))
        .toDF("url", "html_expected")
      val result = got.join(expected, "url")
        .select(col("url"),
          (col("html") === col("html_expected")).as("html_ok"),
          length(col("html")).as("n_bytes"))
      val rows = result.collect()
      val schema = result.schema
      org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
      s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    }),
    // ---- text analysis ----
    "q21_langid" -> ((s, dir) => {
      import s.implicits._
      graft.quality.TextQuality.langId(s, t(s, dir, "documents"))
        .join(t(s, dir, "documents").select(col("doc_id"), col("lang")), "doc_id")
        .select(col("doc_id"), col("pred_lang"), col("lang").as("labeled_lang"))
    }),
    "q22_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        md5(lower(regexp_replace(col("text"), "\\s+", " "))).as("fp_md5"))
    }),
    "q23_quality" -> ((s, dir) => {
      graft.quality.TextQuality.qualitySignals(
        t(s, dir, "documents"), Seq("the", "a", "of", "and", "to"))
    }),
    // ---- multimodal (binary columns; REAL decode via the JDK codecs) ----
    // deterministic per-doc PNG ([[graft.fixtures.MediaGen]]) → real
    // ImageIO decode → real nearest-neighbor resize re-encode → re-decode:
    // dims and channel means have closed forms in doc_id, so the DuckDB
    // oracle pins the whole encode→decode→resize→decode round-trip
    "q24_media_features" -> ((s, dir) => {
      import s.implicits._
      val bin = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => (id, graft.fixtures.MediaGen.pngFor(id))))
        .toDF("doc_id", "blob")
      graft.multimodal.Media.imageFeatures(s, bin, "doc_id", "blob", 48)
        .select("id", "width", "height", "channels", "out_width", "out_height",
          "mean_r", "mean_g", "mean_b")
    }),
    "q25_frame_sample" -> ((s, dir) => {
      val bin = t(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "utf-8").as("blob"))
      // frame_hash (seeded murmur of the frame bytes) is engine-internal and
      // not SQL-expressible — the driver query exposes the oracled columns;
      // hash determinism is pinned by OpsSpec
      graft.multimodal.Media.sampleFrames(s, bin, "doc_id", "blob", 64, 2)
        .select("id", "frame_idx", "frame_bytes")
    }),
    // real RIFF/WAV PCM decode (javax.sound.sampled): header fields, exact
    // frame count, and peak amplitude are closed forms of doc_id (sine
    // period divisible by 4 ⇒ peak == amplitude exactly)
    "q36_wav_meta" -> ((s, dir) => {
      import s.implicits._
      val bin = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => (id, graft.fixtures.MediaGen.wavFor(id))))
        .toDF("doc_id", "blob")
      graft.multimodal.Media.audioMeta(s, bin, "doc_id", "blob")
        .select("id", "sample_rate", "channels", "bits", "n_frames", "peak")
    }),
    // concatenated-PNG "video" → signature split → stride sampling → real
    // per-frame decode; kept-frame dims and red-channel mean are closed
    // forms of (doc_id, frame_idx)
    "q37_video_frames" -> ((s, dir) => {
      import s.implicits._
      val bin = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => (id, graft.fixtures.MediaGen.videoFor(id))))
        .toDF("doc_id", "blob")
      graft.multimodal.Media.sampleVideoFrames(s, bin, "doc_id", "blob", 2)
    }),
    // gap-based sessionization (30-min inactivity closes a session) — the
    // classic web-log operator: lag window → new-session flag → running sum
    // as session id → per-session aggregates. Both sides floor timestamps
    // to whole epoch seconds so gap/duration semantics are identical.
    "q40_sessionize" -> ((s, dir) => {
      val sec = col("ts").cast("timestamp").cast("long")
      // order by the SAME floored-seconds key the gap math uses, so engine
      // and oracle agree even when two events share a floored second
      val w = Window.partitionBy("user_id").orderBy(sec, col("event_id"))
      val gap = sec - lag(sec, 1).over(w)
      val isNew = when(gap.isNull || gap > 1800, 1).otherwise(0)
      t(s, dir, "events")
        .withColumn("session_idx",
          sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_idx")
        .agg(count(lit(1)).as("n_events"),
          (max(sec) - min(sec)).as("duration_s"))
    }),
    // as-of join BY COMPOSITION (the brief's preference (a): existing ops
    // express the semantics — no custom plan needed): for every error
    // event, the latest strictly-preceding click of the same user, via an
    // ignore-nulls last_value window. One shuffle keyed by user_id.
    "q45_asof_attribution" -> ((s, dir) => {
      val sec = col("ts").cast("timestamp").cast("long")
      val w = Window.partitionBy("user_id").orderBy(sec, col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val prevClick = last(when(col("event_type") === "click", sec),
        ignoreNulls = true).over(w)
      t(s, dir, "events")
        .withColumn("sec", sec)
        .withColumn("prev_click_sec", prevClick)
        .filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("sec"),
          col("prev_click_sec"),
          (col("sec") - col("prev_click_sec")).as("gap_s"))
    }),
    // interval (point-in-range) join WITHOUT a nested-loop plan: the
    // bin-bucketing rewrite — each session explodes over the coarse time
    // bins it covers, each probe point maps to its single bin, and the
    // match becomes an EQUI-join on (user_id, bin) + a residual range
    // filter. A raw `ts BETWEEN start AND end` join gives Catalyst no
    // equi key (BroadcastNestedLoopJoin — quadratic per user at scale);
    // the rewrite is one hash-partitioned shuffle per side. Sessions =
    // gap sessionization of click events (the q40 machinery; gap 200000 s
    // ≈ the corpus's per-user click cadence so sessions have real extent);
    // probes = error events attributed to the session containing them.
    // Disjoint per-user sessions + one bin per probe ⇒ no duplicates.
    "q58_interval_join" -> ((s, dir) => {
      val sec = col("ts").cast("timestamp").cast("long")
      val w = Window.partitionBy("user_id").orderBy(sec, col("event_id"))
      val gap = sec - lag(sec, 1).over(w)
      val isNew = when(gap.isNull || gap > 200000, 1).otherwise(0)
      val ev = t(s, dir, "events")
      val sessions = ev.filter(col("event_type") === "click")
        .withColumn("session_idx",
          sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_idx")
        .agg(min(sec).as("s_start"), max(sec).as("s_end"))
      val binSz = 86400L
      // NB Spark's `/` on longs is DOUBLE division — bin ids need floor+cast
      def bin(c: org.apache.spark.sql.Column) = floor(c / binSz).cast("long")
      val sBinned = sessions.withColumn("bin",
        explode(sequence(bin(col("s_start")), bin(col("s_end")))))
      val errs = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), sec.as("err_sec"),
          bin(sec).as("bin"))
      errs.join(sBinned, Seq("user_id", "bin"))
        .filter(col("err_sec").between(col("s_start"), col("s_end")))
        .select("event_id", "user_id", "err_sec", "session_idx", "s_start", "s_end")
    }),
    // BPE-ish pre-tokenizer count (training-data length budgeting) — pure
    // codegen'd regexp, no UDF; the pattern is RE2-compatible so the
    // DuckDB oracle runs the IDENTICAL regex
    "q38_bpe_tokens" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        graft.quality.TextQuality.bpeTokenCount(col("text")).as("n_bpe"))),
    // batched annotator path (reference sentences_per_call knob,
    // ai/extractor_ner.py:72-85): documents have no newlines, so batching
    // must not change the result — same oracle as q10
    "q26_ner_batched" -> ((s, dir) =>
      NerSpark.mentions(s, t(s, dir, "documents"), sentencesPerCall = 3)),
    // LSH candidates verified by exact n-gram Jaccard (the standard
    // near-dup pipeline: cheap filter → exact verify → threshold). At
    // J ≥ 0.5 the 16×4 banding's miss probability is (1-0.5⁴)¹⁶ ≈ 0.35 for
    // a borderline pair, but the corpus's true near-dups all sit at
    // J ≥ 0.9 (miss ≈ 4e-8), so the output equals the brute-force
    // all-pairs answer — which is exactly what the DuckDB oracle computes
    // via an inverted shingle index.
    "q31_neardup_verified" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val candidates = Dedup.minhashPairs(s, docs, 0.1).select("doc_a", "doc_b")
      Dedup.exactJaccard(s, docs, candidates).filter(col("jaccard") >= 0.5)
    }),
    // embedding-cosine near-duplicates via LSH bucket self-join
    "q32_embedding_neardup" -> ((s, dir) =>
      Ann.cosineNearDupPairs(s, t(s, dir, "embeddings"), 64, 4, 0.3)),
    // grouping sets: cube over lang × source (SURVEY §2 grouping-sets note)
    "q28_cube" -> ((s, dir) => {
      t(s, dir, "documents").cube("lang", "source")
        .agg(count(lit(1)).as("n_docs"), round(avg("n_chars"), 4).as("avg_chars"))
    }),
    // global top-k (order-by + limit with deterministic tie-break)
    "q29_topk_docs" -> ((s, dir) => {
      t(s, dir, "documents")
        .orderBy(desc("n_chars"), asc("doc_id"))
        .limit(20)
        .select("doc_id", "n_chars", "lang")
    }),
    // set ops: union + except-style anti over partitioned slices
    "q30_union_except" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val en = d.filter(col("lang") === "en").select("doc_id")
      val long = d.filter(col("n_chars") > 300).select("doc_id")
      en.union(long).distinct()
        .except(d.filter(col("source") === "src0").select("doc_id"))
    }),
    // deterministic hash split — the standard train/val/test assignment
    // for training corpora: the shared md5 bucket ([[graft.core.Buckets]],
    // the SAME primitive as q56's decontam split and q57's sampling, so
    // the three can never drift) in [0,100), 80/10/10. Pure narrow map
    // (no shuffle, no RNG state): any slice of the corpus re-derives the
    // identical assignment on any engine — the property that makes splits
    // reproducible across reruns and backfills.
    "q47_hash_split" -> ((s, dir) => {
      val h = graft.core.Buckets.md5Bucket(col("doc_id"), 100)
      t(s, dir, "documents").select(col("doc_id"), h.as("h"),
        when(h < 80, "train").when(h < 90, "val")
          .otherwise("test").as("split"))
    }),
    // repetition signals (Gopher-style quality rules): duplicate-2gram
    // fraction (HOF over the token array — codegen'd, no shuffle) and
    // top-token fraction (explode → two-level partial aggregation). The
    // standard web-corpus boilerplate/spam detectors.
    "q48_repetition" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val toks = split(trim(col("text")), "\\s+")
      val grams = zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat(a, lit(" "), b))
      val hof = d.select(col("doc_id"),
        when(size(toks) < 2, lit(0.0)).otherwise(
          round(lit(1.0) - size(array_distinct(grams)).cast("double") / size(grams), 4))
          .as("dup_2gram_frac"))
      val top = d.select(col("doc_id"), explode(toks).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(round(max("c").cast("double") / sum("c"), 4).as("top_tok_frac"))
      hof.join(top, "doc_id")
    }),
    // ---- storage-layout operators: the two table designs that delete
    // shuffles/scans at 100 TB (SURVEY §1.4 Iceberg stand-in) ----
    // co-located join: both sides written bucketBy(8, doc_id) → each scan
    // reports HashPartitioning(doc_id, 8) and the sort-merge join plans
    // with NO Exchange on either side (BucketedJoinSpec asserts the plan;
    // hint("merge") keeps the small-SF plan honest where broadcast would
    // otherwise hide the layout's point). The L2 norm is a codegen'd HOF.
    "q49_bucketed_join" -> ((s, dir) => {
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val d = graft.sources.BucketedTables.ensure(s, s"graft_docs_b$sfx",
        t(s, dir, "documents"), "doc_id", 8)
      val e = graft.sources.BucketedTables.ensure(s, s"graft_emb_b$sfx",
        t(s, dir, "embeddings").select(col("vec_id").as("doc_id"),
          col("embedding"), col("label")), "doc_id", 8)
      val norm = sqrt(aggregate(col("embedding"), lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double")))
      d.join(e.hint("merge"), "doc_id")
        .select(col("doc_id"), col("n_chars"), col("label"),
          round(norm, 4).as("emb_norm"))
    }),
    // partition-pruned scan: corpus written partitionBy(lang); the lang
    // filter prunes whole directories at planning time (PartitionFilters
    // in the scan — BucketedJoinSpec asserts only `en` files are read)
    "q50_partition_pruned" -> ((s, dir) => {
      val path = graft.sources.BucketedTables.partitionedDocsByLang(s, dir)
      s.read.parquet(path).filter(col("lang") === "en")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), round(avg("n_chars"), 4).as("avg_chars"))
    }),
    // MERGE upsert — incremental KG snapshot maintenance: base = triples
    // of even docs at rev 1, delta = re-extraction of doc_id%3 docs at
    // rev 2. Matched keys take the delta ('update'), new keys append
    // ('insert'), untouched rows pass through ('keep'). The composed
    // broadcast-delta formulation never shuffles the base snapshot
    // (see [[graft.kg.SnapshotMerge]] scaladoc for the 100 TB regime).
    "q51_merge_upsert" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .filter(col("doc_id") % 2 === 0 || col("doc_id") % 3 === 0)
      val linked = Kg.disambiguate(
        Kg.candidates(NerSpark.mentions(s, docs), Kg.aliasDf(s)))
      // one extraction pass shared by both merge legs (in production base
      // and delta are table scans; here both derive from the same NER
      // subtree, which would otherwise recompute per leg)
      val tr = Kg.triples(linked, NerSpark.Predicates)
        .select(col("subj"), col("pred"), col("obj"),
          substring_index(col("obj"), "/", -1).cast("long").as("did"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      def leg(mod: Int, rev: Int) = tr.filter(col("did") % mod === 0)
        .select("subj", "pred", "obj").withColumn("rev", lit(rev.toLong))
      graft.kg.SnapshotMerge.merge(leg(2, 1), leg(3, 2),
        Seq("subj", "pred", "obj"))
    }),
    // skew profiler: the measurement that decides broadcast vs AQE vs
    // explicit salting (feeds q08's salted join) — top-20 hottest keys
    // with row share and recommended per-key salt factor
    "q52_heavy_hitters" -> ((s, dir) =>
      graft.quality.Skew.heavyHitters(t(s, dir, "events"), "user_id", 20)),
    // degree-ordered distributed triangle count (Suri–Vassilvitskii) over
    // the parts-sharing-an-order co-occurrence graph — the orientation
    // bounds wedge fan-out at O(sqrt(|E|)) per node regardless of skew
    "q53_triangles" -> ((s, dir) =>
      // the RAW (un-checkpointed) edge plan, shared verbatim with q88:
      // orientedOf's internal persist is the reuse point, and identical
      // canonicalized plans let the CacheManager serve both queries from
      // one cached oriented list (see partsCooccurEdgesRaw)
      graft.kg.Triangles.count(s, partsCooccurEdgesRaw(s, dir))),
    // corpus-level TF-IDF top-3 terms per doc: the one text statistic
    // needing a corpus-wide aggregate (df) joined back per row — vocab-
    // sized broadcast, rank-k window with partial WindowGroupLimit
    "q54_tfidf" -> ((s, dir) =>
      graft.quality.TfIdf.topTerms(s, t(s, dir, "documents"), 3)),
    // exact interpolated percentiles per group (Spark `percentile` ==
    // DuckDB quantile_cont); the approx path (percentile_approx/HLL) is
    // accuracy-pinned in SketchSpec — this is the exact-agg complement
    "q55_quantiles" -> ((s, dir) =>
      t(s, dir, "documents").groupBy("lang").agg(
        round(expr("percentile(n_chars, 0.5)"), 4).as("p50"),
        round(expr("percentile(n_chars, 0.9)"), 4).as("p90"),
        round(expr("percentile(n_chars, 0.99)"), 4).as("p99"))),
    // train/eval decontamination (the pre-ship overlap check of every
    // training corpus): eval docs sharing ≥3 distinct word 13-grams with
    // any train doc (the GPT-3-appendix gram length; shorter grams are
    // corpus stop-phrases), joined on 48-bit md5 gram fingerprints —
    // 8-byte exchange keys, train side never exchanged (eval-set
    // broadcast semi-join), boilerplate grams df-capped before the join;
    // the split reuses q47's md5 bucket ([[graft.core.Buckets]]) and the
    // oracle shares every hash primitive (see Decontam)
    "q56_decontamination" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .withColumn("h", graft.core.Buckets.md5Bucket(col("doc_id"), 100))
      graft.dedup.Decontam.contaminatedPairs(
        d.filter(col("h") < 80), d.filter(col("h") >= 80), 3L)
    }),
    // deterministic stratified sampling (corpus rebalancing): per-language
    // keep-rates applied through the same md5 bucket as the q47 split —
    // no RNG state, any slice of the corpus re-derives the same sample
    "q57_stratified_sample" -> ((s, dir) => {
      val h = graft.core.Buckets.md5Bucket(col("doc_id"), 100)
      val rate = when(col("lang") === "en", 50L)
        .when(col("lang") === "de", 25L).otherwise(10L)
      t(s, dir, "documents").withColumn("h", h)
        .filter(col("h") < rate)
        .select(col("doc_id"), col("lang"), col("h"))
    }),
    // bounded-hop BFS (graph traversal — the "entities within k hops"
    // neighborhood query a KG serves constantly): 3 hops from the
    // smallest node of the parts-co-occurrence graph, frontier-relaxed
    // with a visited set so each edge is relaxed at most once per
    // endpoint (see graft.kg.Bfs for the scale shape)
    "q60_khop_bfs" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_partkey")
      val pairs = li.as("a")
        .join(li.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      val canon = graft.kg.Triangles.canonicalEdges(pairs, "u", "v")
      val seeds = canon.agg(min(col("u")).as("node"))
      graft.kg.Bfs.distances(s, canon, seeds, 3)
    }),
    // near-dup cluster collapse — the composition that makes the dedup
    // family actually DELETE documents: LSH pairs (q15 machinery) → star
    // connected components (q13 machinery) → one winner per cluster (min
    // doc_id; singletons win themselves). filter(is_winner) is the
    // deduplicated corpus. The md5-portable hash path lets the oracle
    // replay pairs, components, and the winner rule end-to-end.
    "q61_neardup_clusters" -> ((s, dir) =>
      Dedup.clusters(s, t(s, dir, "documents"), 0.5, portableHash = true)),
    // span-level corpus dedup (C4/RefinedWeb hygiene): 3-token spans,
    // corpus-wide distinct-doc frequency per span fingerprint, keep flag
    // at df ≤ 2 — the cross-document boilerplate detector that per-doc
    // signals (q17/q48) cannot express. Newline-line variant + the strip
    // half (cleanedText) are OpsSpec-pinned with planted boilerplate.
    "q62_line_dedup" -> ((s, dir) =>
      Dedup.lineFlags(Dedup.spansOf(t(s, dir, "documents"), 3), 2L)),
    // the strip half of span dedup: per-doc text rebuilt from surviving
    // spans in original order — the output a hygiene pass actually ships
    "q63_line_dedup_strip" -> ((s, dir) =>
      Dedup.cleanedText(Dedup.spansOf(t(s, dir, "documents"), 3), 2L, " ")
        .withColumnRenamed("text", "clean_text")),
    // incremental delta-dedup against a landed corpus (the continuous-crawl
    // shape): corpus = md5-bucket < 90 of the documents table, batch = the
    // rest (the SAME shared bucket primitive as q47/q56/q57, so the "landed
    // corpus" here is exactly q47's train+val side); each batch doc is
    // classified exact_dup / near_dup / new with min-corpus-doc attribution
    "q64_delta_dedup" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val h = graft.core.Buckets.md5Bucket(col("doc_id"), 100)
      Dedup.deltaMd5(s, d.filter(h < 90), d.filter(h >= 90), 0.5)
    }),
    // PII scrubbing (RefinedWeb/FineWeb hygiene): deterministic planted PII
    // derived from doc_id (the synthetic corpus contains none), then count +
    // redact — all codegen'd regexp, narrow, fully replayed by the oracle
    "q65_pii_scrub" -> ((s, dir) => {
      val planted = concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"), lit("@example.com"),
        when(col("doc_id") % 3 === 0, concat(lit(" from 10.0."),
          (col("doc_id") % 256).cast("string"), lit("."),
          (col("doc_id") % 100).cast("string"))).otherwise(lit("")),
        when(col("doc_id") % 5 === 0, concat(lit(" call 555-"),
          lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"))).otherwise(lit("")))
      graft.quality.Pii.scrub(
        t(s, dir, "documents").select(col("doc_id"), planted.as("text")))
    }),
    // unigram-LM quality score (the CCNet perplexity filter's shape): per-doc
    // mean token log-prob under the corpus's own unigram model
    "q66_unigram_logprob" -> ((s, dir) =>
      graft.quality.LmScore.unigramLogProb(t(s, dir, "documents"))),
    // sequence packing: global token start-offsets + context-window ids in
    // doc_id order via the distributed prefix-sum (per-bucket totals →
    // driver prefix scan → broadcast offsets → per-bucket window) — never a
    // single-task global Window.orderBy
    "q67_sequence_pack" -> ((s, dir) =>
      graft.core.SequencePack.pack(s, t(s, dir, "documents"), 4096)),
    // per-domain corpus rollup (the FineWeb domain-filter shape): host from
    // a deterministic synthesized URL (the sf tables carry no url column),
    // registered domain = last two host labels, then count/chars/share per
    // domain; total doc count is a measured scalar, not a global window
    "q68_domain_stats" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      // host (www.)?pages.<source>.org → registered domain <source>.org:
      // ~20 domains, each folding its www/bare host variants together
      val url = concat(lit("https://"),
        when(col("doc_id") % 4 === 0, lit("www.")).otherwise(lit("")),
        lit("pages."), col("source"),
        lit(".org/page/"), col("doc_id").cast("string"))
      val total = d.count()
      d.select(col("doc_id"), url.as("url"), col("n_chars"))
        .withColumn("host", regexp_extract(col("url"), "^[a-z]+://([^/]+)/", 1))
        .withColumn("domain", regexp_extract(col("host"), "([^.]+\\.[^.]+)$", 1))
        .groupBy("domain")
        .agg(count(lit(1)).as("n_docs"),
          round(avg(col("n_chars")), 4).as("avg_chars"))
        .withColumn("doc_share", round(col("n_docs") / lit(total), 4))
    }),
    // entity co-occurrence PMI (the statistical relation-proposal step of
    // KG construction): linked entities per doc (same linking as q12/q13),
    // per-doc pairs generated from ONE aggregated sorted array — never a
    // corpus self-join (see Cooccur for the scale argument)
    "q69_entity_pmi" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val linked = Kg.disambiguate(
        Kg.candidates(NerSpark.mentions(s, docs), Kg.aliasDf(s)))
      graft.kg.Cooccur.entityPmi(linked, docs.count())
    }),
    // URL canonicalization + crawl dedup (RFC 3986 §6 ladder + utm strip):
    // four deterministic crawl variants per canonical target — tracking
    // param, uppercase scheme+host, www+:443+fragment, trailing slash —
    // must collapse to one group of 4 (see text.UrlCanon)
    "q70_url_canonical" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val g = floor(col("doc_id") / 4).cast("long")
      val host = concat(lit("pages.s"), (g % 5).cast("string"), lit(".org"))
      val path = concat(lit("/p/"), g.cast("string"))
      val url = when(col("doc_id") % 4 === 0,
          concat(lit("https://"), host, path, lit("?utm_source=feed")))
        .when(col("doc_id") % 4 === 1, concat(lit("HTTPS://"), upper(host), path))
        .when(col("doc_id") % 4 === 2,
          concat(lit("https://www."), host, lit(":443"), path, lit("#sec")))
        .otherwise(concat(lit("https://"), host, path, lit("/")))
      graft.text.UrlCanon.dedupByCanonical(d.select(col("doc_id"), url.as("url")))
    }),
    // rare-token inverted index (posting-list construction): df first (a
    // pure count, safe for stopwords), collect_list ONLY after the df
    // filter bounds every posting at maxDf entries (see text.InvertedIndex);
    // the ceiling is data-relative (8th-smallest distinct df) because the
    // synthetic vocabulary is tiny and flat — an absolute cutoff is either
    // empty or everything
    "q71_inverted_index" -> ((s, dir) =>
      graft.text.InvertedIndex.rarePostingsByRank(t(s, dir, "documents"), 8)),
    // model-based quality gate (fastText/CCNet shape): hashed-TF features
    // (q43 machinery) · broadcast weight vector → sigmoid → keep flag
    "q72_quality_classifier" -> ((s, dir) =>
      graft.quality.Classifier.score(s, t(s, dir, "documents"), 64)),
    // k-core backbone of the parts co-occurrence graph (same edges as
    // q53/q60): peel degree<80 nodes to fixpoint — 6 cascade rounds and a
    // non-empty core at sf0.01; oracle unrolls the engine-measured rounds
    "q73_kcore" -> ((s, dir) => {
      // RAW plan: coreWithRounds checkpoints its edge input at entry —
      // a checkpointed helper here would materialize the graph twice
      val (deg, rounds) =
        graft.kg.KCore.coreWithRounds(s, partsCooccurEdgesRaw(s, dir), KCoreK)
      KCoreRoundsMemo.put(dir, rounds)
      deg
    }),
    // deterministic corrupted-subject negatives for KG-embedding training
    // (TransE-style): md5 offset in [1, V-1] guarantees neg != subj with
    // no retry loop; vocabulary index is entity-sized, never corpus-sized
    "q74_kg_negatives" -> ((s, dir) =>
      graft.kg.Negatives.corruptSubject(s, kgTriples(s, dir))),
    // link prediction over the parts co-occurrence graph (same edges as
    // q53/q60/q73): wedge-enumerated common-neighbor / Jaccard /
    // Adamic-Adar scores for ABSENT pairs — the relation-inference step
    // that proposes new KG edges (see kg.LinkPredict for the hub-cap
    // scale argument). The cap is the MEASURED p75 degree percentile
    // (memoized; the oracle inlines the same value) — data-relative, so
    // the wedge bound tracks the graph's density instead of a constant
    // tuned to one scale factor.
    "q75_link_predict" -> ((s, dir) => {
      val canon = partsCooccurEdges(s, dir)
      val cap = LinkPredCapMemo.getOrElseUpdate(dir,
        graft.kg.LinkPredict.measuredHubCap(canon, LinkPredHubPct))
      graft.kg.LinkPredict.candidates(canon, cap, LinkPredMinCommon)
    }),
    // gap-based sessionization of the event log (the batch analog of
    // session_window): one user-keyed shuffle, both window passes share
    // the exchange; 8h gap splits the sf event stream into a real mix of
    // session sizes (median inter-event gap is ~7h)
    "q76_sessionize" -> ((s, dir) => {
      val e = t(s, dir, "events").select(col("user_id"), col("event_id"),
        floor(unix_timestamp(col("ts").cast("timestamp"))).cast("long").as("sec"))
      graft.streaming.Sessionize.sessions(e, SessionGapS)
    }),
    // N-Triples interchange roundtrip: serialize the KG triples to spec
    // lines (escaped literals, IRI-validated subj/pred), parse them back
    // in the same plan, and emit rt_ok per row — a parse bug flips the
    // flag and breaks the oracle hash
    "q77_ntriples_roundtrip" -> ((s, dir) => {
      import graft.sinks.NTriples
      // serialize and parse are projections, so source + line + re-parse
      // zip in ONE plan — rt_ok is computed, not asserted
      kgTriples(s, dir)
        .withColumn("line",
          NTriples.lineOf(col("subj"), col("pred"), col("obj")))
        .withColumn("back", NTriples.parsed(col("line")))
        .select(col("subj"), col("pred"), col("obj"), col("line"),
          (col("back.subj") === col("subj") &&
            col("back.pred") === col("pred") &&
            col("back.obj") === col("obj")).as("rt_ok"))
    }),
    // ontology hygiene: subjects carrying >1 distinct object on a
    // predicate declared functional (OWL FunctionalProperty / SHACL
    // maxCount 1) — the post-merge audit step of KG construction
    "q78_functional_violations" -> ((s, dir) =>
      graft.kg.Ontology.functionalViolations(kgTriples(s, dir),
        FunctionalPreds)),
    // sorted-neighborhood entity resolution: clean customer names + a
    // deterministic dirty variant per record (trailing space for even
    // keys, doubled last character for odd — both 1-edit, SUFFIX dirt so
    // each dirty record sorts within a rank or two of its clean twin)
    // must re-pair through rank-banded neighbor comparison + edit
    // distance; a skew-proof alternative to blocking (every name shares
    // one prefix, so prefix blocking would be one quadratic block)
    "q79_er_match" -> ((s, dir) =>
      graft.text.ErMatch.sortedNeighborhood(erRecords(s, dir),
        ErWindow, ErMaxDist)),
    // RDFS materialized type inference: linked entities carry their
    // direct category plus every superclass from the declared hierarchy's
    // transitive closure (closure is driver-computed METADATA — see
    // kg.Ontology.subclassClosure for why that's the right tier)
    "q80_type_closure" -> ((s, dir) => {
      val linked = Kg.disambiguate(
        Kg.candidates(kgMentions(s, dir), Kg.aliasDf(s)))
      graft.kg.Ontology.inferTypes(s,
        linked.select(col("entity_id"), col("category")).distinct(),
        ClassHierarchy)
    }),
    // SPARQL star BGP on a shared object: TOOL and DATA entities grounded
    // in the SAME page (`?a uses_tool ?o . ?b consumes ?o`) — predicate
    // filters push to the scan, then one hash join on obj
    "q81_star_bgp" -> ((s, dir) =>
      graft.kg.TriplePatterns.starOnObject(kgTriples(s, dir),
        "uses_tool", "consumes")),
    // crawl-over-crawl KG snapshot diff: two deterministic doc-subset
    // snapshots (docs with id%3≠0 vs id%3≠1) → kept/added/removed per
    // triple via one co-partitioned full-outer join
    "q82_snapshot_diff" -> ((s, dir) => {
      val tr = kgTriples(s, dir)
      val docId = regexp_extract(col("obj"), "^doc://(\\d+)$", 1).cast("long")
      graft.kg.TriplePatterns.snapshotDiff(
        tr.filter(docId % 3 =!= 0), tr.filter(docId % 3 =!= 1))
    }),
    // distant-supervision relation patterns: trimmed text between FIRST
    // mentions of ordered entity pairs within 40 chars, counted
    // corpus-wide (first mentions bound the per-doc self-join at
    // dictionary², never mention-count²)
    "q83_relation_contexts" -> ((s, dir) => {
      val linked = Kg.disambiguate(
        Kg.candidates(kgMentions(s, dir), Kg.aliasDf(s)))
      graft.kg.RelationMining.firstMentionContexts(
        linked, t(s, dir, "documents"), RelCtxMaxGap)
    }),
    // per-document entity salience: mention density + early-position
    // bonus — the aboutness score KG builders rank page entities by
    "q84_entity_salience" -> ((s, dir) => {
      val linked = Kg.disambiguate(
        Kg.candidates(kgMentions(s, dir), Kg.aliasDf(s)))
      graft.kg.RelationMining.salience(linked, t(s, dir, "documents"))
    }),
    // temporal scoping of facts: deterministic synthesized crawl ts per
    // grounding page (epoch base + doc_id·3600, the q68 synthesis
    // pattern) → first/last-seen window per (subj, pred)
    "q85_triple_temporal" -> ((s, dir) => {
      val did = regexp_extract(col("obj"), "^doc://(\\d+)$", 1).cast("long")
      graft.kg.TriplePatterns.temporalScope(
        kgTriples(s, dir).withColumn("ts_s", lit(CrawlEpochBase) + did * 3600L))
    }),
    // DeepWalk/node2vec walk-corpus prep over the parts co-occurrence
    // graph: every step's "random" neighbor choice is md5(walk_id|step)
    // mod degree over the sorted neighbor list — deterministic and
    // oracle-replayable (see kg.RandomWalks)
    "q86_random_walks" -> ((s, dir) =>
      graft.kg.RandomWalks.walks(s, partsCooccurEdges(s, dir),
        WalksPerNode, WalkSteps)),
    // entity vectors by context pooling: mean document embedding over
    // the pages an entity is grounded in, cell-shaped (entity, j, v)
    "q87_entity_embeddings" -> ((s, dir) => {
      val linked = Kg.disambiguate(
        Kg.candidates(kgMentions(s, dir), Kg.aliasDf(s)))
      graft.kg.RelationMining.contextEmbeddings(
        linked, t(s, dir, "embeddings"))
    }),
    // local clustering coefficient per vertex (q53's degree-oriented
    // triangle machinery + one narrow corner-charge explode): the
    // per-entity "how clique-like is this neighborhood" signal — hubs
    // score low, single-topic entities high (see kg.ClusteringCoeff)
    "q88_clustering_coeff" -> ((s, dir) =>
      // RAW plan shared with q53 — one oriented-list cache for both
      graft.kg.ClusteringCoeff.run(s, partsCooccurEdgesRaw(s, dir))),
    // deterministic synchronous label propagation (3 rounds, min-label
    // tie-break): community detection between CC (too coarse) and
    // modularity methods (too expensive) — see kg.LabelProp for why the
    // async textbook variant is unreplayable and wrong for this engine
    "q89_label_prop" -> ((s, dir) =>
      // RAW plan: LabelProp checkpoints `und` at entry, and its two
      // union legs share the self-join exchange within that one job
      graft.kg.LabelProp.run(s, partsCooccurEdgesRaw(s, dir), LabelPropRounds)),
    // bigram-LM quality score with add-1 smoothing (the order-2 CCNet
    // filter): catches shuffled/stitched text that unigram frequencies
    // (q66) score as fluent; bigrams built narrow via arrays_zip of
    // shifted slices — no self-join, no per-token window
    "q90_bigram_logprob" -> ((s, dir) =>
      graft.quality.LmScore.bigramLogProb(t(s, dir, "documents"))),
    // Heaps'-law vocabulary-growth curve + fitted exponent: cumulative
    // tokens/types per doc via the distributed prefix sum (q67's layout —
    // never a single-task global window); each token type charges its
    // FIRST doc so "cumulative distinct" is one aggregate, not a
    // quadratic per-prefix distinct (see quality.VocabGrowth)
    "q91_heaps_law" -> ((s, dir) =>
      graft.quality.VocabGrowth.heapsCurve(s, t(s, dir, "documents"))),
    // personalized PageRank from the graph's min node over the parts
    // co-occurrence graph (seed-teleport variant of q41): random-walk
    // proximity to a seed entity — the related-entity panel / ER-block
    // expansion score (see kg.PageRank.personalized)
    "q92_personalized_pagerank" -> ((s, dir) => {
      val canon = partsCooccurEdges(s, dir)
      val und = canon.select(col("u").as("src"), col("v").as("dst"))
        .union(canon.select(col("v").as("src"), col("u").as("dst")))
      graft.kg.PageRank.personalized(s, und,
        canon.agg(min(col("u")).as("node")), PprIters)
    }),
    // VoID-style predicate cardinality profile of the extracted KG:
    // triple count, distinct subjects/objects, mean out-fanout per
    // predicate — the dataset-statistics block published KGs ship and
    // the join-ordering input for BGP queries (see kg.Ontology)
    "q93_pred_cardinality" -> ((s, dir) =>
      graft.kg.Ontology.predicateProfile(kgTriples(s, dir))),
    // degree assortativity of the parts co-occurrence graph: the one-
    // number mixing diagnostic (hubs-link-hubs vs hubs-link-leaves) that
    // tells a graph workload whether its hot keys collide (see
    // kg.Assortativity for the skew-strategy link)
    "q94_assortativity" -> ((s, dir) =>
      graft.kg.Assortativity.run(partsCooccurEdges(s, dir))),
    // CCNet-style perplexity bucketing: unigram scores (q66) cut at exact
    // decile boundaries (ONE single-group percentile aggregate — never a
    // global ntile window), bucket rollup with score ranges. Cutpoints
    // are measured once and MEMOIZED so the oracle bins with the same
    // values the query did (the q73/q75 memo pattern)
    "q95_perplexity_buckets" -> ((s, dir) =>
      graft.quality.LmScore.bucketsAt(t(s, dir, "documents"),
        PerplexityCutsMemo.getOrElseUpdate(dir,
          graft.quality.LmScore.scoreCutpoints(t(s, dir, "documents"), 10)))),
    // community quality rollup composing q89: per-label member count,
    // internal edge count, and density — the assignment+quality pair
    // that makes label propagation a deliverable, not a column
    "q96_community_rollup" -> ((s, dir) => {
      val canon = partsCooccurEdges(s, dir)
      // the rollup references the label frame twice (member counts +
      // internal-edge joins) — checkpoint it once or BOTH references
      // re-run the full 3-round propagation (measured 5.3 s → ~2 s,
      // OPTIMIZATION_r06)
      graft.kg.LabelProp.communityRollup(
        graft.kg.LabelProp.run(s, canon, LabelPropRounds).localCheckpoint(),
        canon)
    }),
    // incremental connected components (the continuous-crawl delta shape):
    // land 80% of the edges, label them, then fold the remaining 20% in
    // as a delta against the stored labeling — the result must equal a
    // full recompute (the oracle replays the FULL graph), which is the
    // invariant that makes the incremental path trustworthy (see
    // kg.ConnectedComponents.incremental for the star-compression
    // convergence argument)
    "q97_incremental_cc" -> ((s, dir) => {
      val canon = partsCooccurEdges(s, dir)
      val old = canon.filter((col("u") + col("v")) % 10 < 8)
        .select(col("u").as("src"), col("v").as("dst"))
      val delta = canon.filter((col("u") + col("v")) % 10 >= 8)
        .select(col("u").as("src"), col("v").as("dst"))
      // the "landed" labeling is STORED, as in production (a crawl folds
      // deltas into a labeling table it already has — re-deriving it per
      // run would benchmark the wrong thing). Written once per sf dir,
      // keyed by source mtime+size so regenerated data invalidates it,
      // PLUS an algorithm-version token — unlike the q59 copy this caches
      // ALGORITHM OUTPUT, so a change to the edge derivation, the split
      // rule, or the CC winner rule must bump CcLabelsVer or a stale
      // labeling survives rebuilds and reads as an incremental-CC bug.
      // Per-pid staging + atomic publish (the q59 reuse pattern).
      val src = new java.io.File(s"$dir/lineitem.parquet")
      val labelsPath = s"${graft.core.TmpFs.base}/graft-cc-labels-$CcLabelsVer-" +
        s"${dir.replaceAll("[^A-Za-z0-9.]", "_")}-${src.lastModified}-${src.length}"
      graft.core.TmpFs.ensureShared(labelsPath) { staging =>
        graft.kg.ConnectedComponents.runStar(s, old)
          .repartition(4).write.mode("overwrite").parquet(staging)
      }
      graft.kg.ConnectedComponents.incremental(s,
        s.read.parquet(labelsPath), delta)
    }),
    // log2-binned degree histogram: the power-law diagnostic that decides
    // whether a graph workload needs the q52/q08 salting machinery —
    // integer-exact bit-length buckets, never float log2 (boundary
    // degrees would bucket differently across engines)
    "q98_degree_histogram" -> ((s, dir) =>
      // RAW plan: a single aggregate pass — no second reference to pay for
      graft.kg.Assortativity.degreeHistogram(partsCooccurEdgesRaw(s, dir))),
    // asymmetric shingle containment (quote / paragraph-copy detection):
    // the near-dup measure Jaccard-tuned LSH misses — the physical plan
    // (direct posting self-join vs ppjoin-style prefix filtering) chosen
    // ADAPTIVELY from measured df stats over the stop-shingle-capped
    // space; cap data-relative at 15% of the corpus in integer math
    // (see Dedup.containmentPairsAdaptive — identical rows either way)
    "q99_containment" -> ((s, dir) =>
      Dedup.containmentPairsAdaptive(t(s, dir, "documents"), ContainDfPct,
        ContainMinOverlap)),
    // rdfs:domain / SHACL sh:class audit over the extracted KG: subjects
    // using a predicate whose declared domain is missing from their
    // inferred type closure — `performs` is declared against the wrong
    // branch on purpose, so the audit surfaces a real planted modeling
    // error (see kg.Ontology.domainViolations)
    "q100_domain_violations" -> ((s, dir) => {
      val linked = Kg.disambiguate(
        Kg.candidates(kgMentions(s, dir), Kg.aliasDf(s))).localCheckpoint()
      val types = graft.kg.Ontology.inferTypes(s,
        linked.select(col("entity_id"), col("category")).distinct(),
        ClassHierarchy)
      // triples from the SAME linked frame — kgTriples(s, dir) would
      // re-run the whole extraction+linking pipeline a second time
      graft.kg.Ontology.domainViolations(s,
        Kg.triples(linked, NerSpark.Predicates), types, PredDomains)
    }),
    // PARIS-style predicate alignment: extractor A (docs with id%3≠0,
    // original vocabulary) vs extractor B (docs with id%3≠1, every
    // predicate renamed) — the rename map is recovered purely from
    // shared (subj, obj) evidence, no name similarity (see
    // kg.Ontology.alignPredicates)
    "q101_pred_alignment" -> ((s, dir) => {
      val tr = kgTriples(s, dir)
      val did = regexp_extract(col("obj"), "^doc://(\\d+)$", 1).cast("long")
      graft.kg.Ontology.alignPredicates(
        tr.filter(did % 3 =!= 0),
        tr.filter(did % 3 =!= 1).withColumn("pred", predAliasExpr))
    }),
    // multi-source fact fusion: three extractor sources each corrupt the
    // functional in_nation fact on their own suppkey residue class mod 7
    // → deterministic majority vote resolves every subject back to the
    // clean fact (the ACTION on q78's violation audit; see
    // kg.Fusion.majorityVote)
    "q102_fact_fusion" -> ((s, dir) => {
      val sup = t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
      val claims = (0 until FusionSources).map { k =>
        sup.select(
          concat(lit("s_"), col("s_suppkey").cast("string")).as("subj"),
          lit("in_nation").as("pred"),
          concat(lit("n_"),
            when((col("s_suppkey") + k) % FusionCorruptMod === 0,
              (col("s_nationkey") + 1 + k) % 25)
              .otherwise(col("s_nationkey")).cast("string")).as("obj"),
          lit(k).as("source"))
      }.reduce(_ union _)
      graft.kg.Fusion.majorityVote(claims)
    }),
    // capture–recapture completeness estimation: two salted 70%-per-fact
    // "captures" of the KG (independent md5 coin flips per fact, the
    // shared Buckets primitive) → Lincoln–Petersen/Chapman estimates of
    // the unobservable fact population per predicate — the non-parametric
    // recall method (Luggen et al. ISWC 2019); see Ontology.captureRecapture
    "q103_recall_estimate" -> ((s, dir) => {
      val tr = kgTriples(s, dir).select("subj", "pred", "obj")
      def capture(salt: String) = tr.filter(graft.core.Buckets.md5Bucket(
        concat_ws("|", lit(salt), col("subj"), col("pred"), col("obj")),
        10) < 7)
      graft.kg.Ontology.captureRecapture(capture("cra"), capture("crb"))
    }),
    // reliability-weighted fusion: a correlated coin-flip source PAIR
    // agrees on a wrong fact for every even suppkey — unweighted majority
    // (q102) is structurally wrong there, while log-odds weights
    // calibrated on the gold subset give the pair ~zero combined voice
    // and the 95%-reliable solo wins; see kg.Fusion.weightedVote
    "q104_weighted_fusion" -> ((s, dir) =>
      graft.kg.Fusion.weightedVote(
        weightedFusionClaims(s, dir), q104Weights(s, dir))),
    // the ACTION on q101's alignment: merge the two extractor KGs — B's
    // predicates rewritten through the recovered rename map (threshold
    // MergeMinJaccard, best canon per pred_b), union collapsed to distinct
    // facts with per-side provenance; see kg.Ontology.mergeAligned
    "q105_kg_merge" -> ((s, dir) => {
      val tr = kgTriples(s, dir)
      val did = regexp_extract(col("obj"), "^doc://(\\d+)$", 1).cast("long")
      graft.kg.Ontology.mergeAligned(
        tr.filter(did % 3 =!= 0),
        tr.filter(did % 3 =!= 1).withColumn("pred", predAliasExpr),
        MergeMinJaccard)
    }),
    // inverse-predicate detection — the orientation half of alignment:
    // a third extractor emits REVERSED facts (doc-as-subject) under an
    // inv_-prefixed vocabulary for docs with even id; inversePairs
    // recovers exactly the (pred, inv_pred) pairs from reversed-fact
    // overlap, jaccard ≈ the even-doc share (see kg.Ontology.inversePairs)
    "q106_inverse_preds" -> ((s, dir) => {
      val tr = kgTriples(s, dir)
      val did = regexp_extract(col("obj"), "^doc://(\\d+)$", 1).cast("long")
      val inv = tr.filter(did % 2 === 0).select(
        col("obj").as("subj"),
        concat(lit("inv_"), col("pred")).as("pred"),
        col("subj").as("obj"))
      graft.kg.Ontology.inversePairs(tr.unionByName(inv))
    }),
    // alias-dictionary bootstrap: link with a REDUCED dictionary (the
    // MinedSurfaces held out), then mine the held-out surfaces' entity
    // associations from per-doc co-occurrence with confidently-linked
    // entities (see kg.Kg.mineAliases)
    "q107_alias_mining" -> ((s, dir) => {
      import s.implicits._
      val reduced = graft.kg.Kg.Aliases
        .filterNot { case (a, _, _) => MinedSurfaces(a) }
        .toDF("alias", "entity_id", "score")
      val cand = Kg.candidates(kgMentions(s, dir), reduced)
      graft.kg.Kg.mineAliases(
        cand.filter(col("entity_id").isNull)
          .select(col("doc_id"), col("surface")),
        Kg.disambiguate(cand).select(col("doc_id"), col("entity_id")),
        MineMinSupport, MineMinConf)
    }),
    // chain BGP (SPARQL `performs/from_source`): entity → evidence page →
    // corpus source, over the KG extended with doc-metadata triples from
    // the documents table — the provenance profile per entity (see
    // kg.TriplePatterns.chain)
    "q108_chain_bgp" -> ((s, dir) => {
      val meta = t(s, dir, "documents").select(
        concat(lit("doc://"), col("doc_id").cast("string")).as("subj"),
        lit("from_source").as("pred"),
        col("source").as("obj"))
      graft.kg.TriplePatterns.chain(
        kgTriples(s, dir).unionByName(meta), "performs", "from_source")
    }),
    // generic BGP compiler: the chain+star pattern `?e performs ?d .
    // ?d from_source ?src . ?e2 consumes ?d` compiled to greedy
    // connected equi-joins — the general form q81/q108 hand-wrote (see
    // kg.TriplePatterns.bgp; the spec pins no-cartesian plans)
    "q111_bgp_compile" -> ((s, dir) => {
      val meta = t(s, dir, "documents").select(
        concat(lit("doc://"), col("doc_id").cast("string")).as("subj"),
        lit("from_source").as("pred"),
        col("source").as("obj"))
      graft.kg.TriplePatterns.bgp(
        kgTriples(s, dir).unionByName(meta),
        Seq(("?e", "performs", "?d"), ("?d", "from_source", "?src"),
          ("?e2", "consumes", "?d")))
    }),
    // AMIE-style path-rule mining over the KG plus per-doc cooccurs_with
    // facts: discovers e.g. `cooccurs(x,y) ∧ consumes(y,d) ⇒
    // consumes(x,d)` (co-occurrence predicts shared grounding) and the
    // co-occurrence transitivity rule, scored by support / std
    // confidence / head coverage (see kg.Rules.minePathRules)
    "q112_rule_mining" -> ((s, dir) => {
      val linked = Kg.disambiguate(
        Kg.candidates(kgMentions(s, dir), Kg.aliasDf(s)))
      // the rule miner scans the union KG once per rule shape — checkpoint
      // it so each scan reads the stored triples instead of re-running
      // extraction+linking+co-occurrence (kgTriples' rationale)
      graft.kg.Rules.minePathRules(
        Kg.triples(linked, NerSpark.Predicates).select("subj", "pred", "obj")
          .unionByName(cooccurFacts(linked)).localCheckpoint(),
        RuleMinSupport, RuleMinConf)
    }),
    // forward-chain the accepted rules (confidence ≥ 0.8 — the
    // co-occurrence transitivity rule) once over the same KG: entailed-
    // but-missing facts land as provenance=inferred beside the asserted
    // stream — the step that makes q112's measurement grow the KG (see
    // kg.Rules.applyRules)
    "q113_rule_apply" -> ((s, dir) => {
      val linked = Kg.disambiguate(
        Kg.candidates(kgMentions(s, dir), Kg.aliasDf(s)))
      // mine + apply together scan the union KG many times over —
      // checkpoint it once for both (q112's rationale)
      val u = Kg.triples(linked, NerSpark.Predicates)
        .select("subj", "pred", "obj")
        .unionByName(cooccurFacts(linked))
        .localCheckpoint()
      graft.kg.Rules.applyRules(u,
        graft.kg.Rules.minePathRules(u, RuleMinSupport, RuleApplyMinConf))
    }),
    // SPARQL OPTIONAL: the language annotation exists only for non-en
    // pages, so the optional leg genuinely null-fills — left-join BGP
    // semantics over the same union KG (see kg.TriplePatterns.bgpOptional)
    "q114_bgp_optional" -> ((s, dir) => {
      val meta = t(s, dir, "documents").filter(col("lang") =!= "en")
        .select(
          concat(lit("doc://"), col("doc_id").cast("string")).as("subj"),
          lit("in_lang").as("pred"), col("lang").as("obj"))
      graft.kg.TriplePatterns.bgpOptional(
        kgTriples(s, dir).unionByName(meta),
        Seq(("?e", "performs", "?d")),
        Seq(Seq(("?d", "in_lang", "?lg"))))
    }),
    // entity summarization (RELIN informativeness): each entity's 3
    // most-DISTINGUISHING co-occurrence partners — facts ranked by
    // ascending corpus frequency of the (pred, obj) value (see
    // kg.Summarize.topFacts)
    "q115_entity_summary" -> ((s, dir) => {
      val linked = Kg.disambiguate(
        Kg.candidates(kgMentions(s, dir), Kg.aliasDf(s)))
      graft.kg.Summarize.topFacts(cooccurFacts(linked), 3)
    }),
    // bounded property-path closure (SPARQL copurchase{1,3}) over the
    // repeat co-purchase DAG: parts sharing ≥ 2 orders, directed
    // u < v — every pair reachable in ≤ 3 hops with its minimal hop
    // count (see kg.TriplePatterns.closure)
    "q116_path_closure" -> ((s, dir) =>
      graft.kg.TriplePatterns.closure(
        copurchaseEdges(s, dir), "copurchase", Q116MaxHops)),
    // owl:sameAs fact collapse through the near-dup cluster map (the q61
    // composition): facts grounded in mirror pages re-ground on the
    // cluster winner's page URI with n_sources = distinct pre-collapse
    // pages — the step that makes near-dup detection change the KG, not
    // just the corpus (see kg.SameAs)
    "q117_sameas_collapse" -> ((s, dir) => {
      val linked = Kg.disambiguate(
        Kg.candidates(kgMentions(s, dir), Kg.aliasDf(s)))
      graft.kg.SameAs.collapseFacts(linked,
        Dedup.clusters(s, t(s, dir, "documents"), 0.5, portableHash = true),
        NerSpark.Predicates)
    }),
    // measurement-literal normalization: planted mixed-format quantities
    // (comma-grouped, decimal, unit-attached) extracted by one codegen'd
    // regexp pass and normalized onto exact SI micro-integer BIGINTs (see
    // text.Literals; the q65 planted-input pattern — the synthetic corpus
    // asserts no quantities of its own)
    "q118_measurements" -> ((s, dir) =>
      graft.text.Literals.measurements(
        plantedMeasurementDocs(s, dir), "doc_id", "text")),
    // SPARQL MINUS: every `?e performs ?d` solution whose page does NOT
    // carry a language annotation — the set-difference complement of
    // q114's OPTIONAL, compiled to one left-anti join (see
    // kg.TriplePatterns.bgpMinus)
    "q119_bgp_minus" -> ((s, dir) => {
      val meta = t(s, dir, "documents").filter(col("lang") =!= "en")
        .select(
          concat(lit("doc://"), col("doc_id").cast("string")).as("subj"),
          lit("in_lang").as("pred"), col("lang").as("obj"))
      graft.kg.TriplePatterns.bgpMinus(
        kgTriples(s, dir).unionByName(meta),
        Seq(("?e", "performs", "?d")),
        Seq(("?d", "in_lang", "?lg")))
    }),
    // bounded transitive reduction over the q116 co-purchase DAG: flag
    // each asserted edge that a 2..3-hop path entails — the maintenance
    // audit that keeps crawled hierarchies minimal (see
    // kg.TriplePatterns.transitiveReduction)
    "q120_transitive_reduction" -> ((s, dir) =>
      graft.kg.TriplePatterns.transitiveReduction(
        copurchaseEdges(s, dir), "copurchase", Q116MaxHops)),
    // schema (quotient) graph summarization: the instance KG collapsed
    // onto entity types — one row per (subj_type, pred, obj_type) with
    // instance support; doc:// objects land in the untyped bucket by
    // design (see kg.Summarize.schemaGraph)
    "q121_schema_graph" -> ((s, dir) => {
      val linked = Kg.disambiguate(
        Kg.candidates(kgMentions(s, dir), Kg.aliasDf(s)))
      graft.kg.Summarize.schemaGraph(
        Kg.triples(linked, NerSpark.Predicates).select("subj", "pred", "obj"),
        linked.select(col("entity_id").as("node"),
          col("category").as("type")).distinct())
    }),
    // link-prediction ranking evaluation (the Liben-Nowell–Kleinberg
    // held-out protocol): one md5 bucket of true edges held out, q75's
    // candidates regenerated on the rest, and the removed edges scored by
    // rank — MRR shipped as an exact integer micro-sum (see
    // kg.LinkPredict.evalRanking)
    "q122_linkpred_eval" -> ((s, dir) => {
      // RAW edge plan: evalRanking persists its keyed split internally
      // and is deliberately lazy end-to-end — an eager checkpoint here
      // would force the graph derivation at build time for nothing
      val canon = partsCooccurEdgesRaw(s, dir)
      val cap = LinkPredCapMemo.getOrElseUpdate(dir,
        graft.kg.LinkPredict.measuredHubCap(canon, LinkPredHubPct))
      graft.kg.LinkPredict.evalRanking(canon,
        LinkPredEvalMod, LinkPredEvalBucket, cap, LinkPredMinCommon)
    }),
    // SHACL-lite cardinality-shape validation: every typed entity checked
    // against its type's declared (pred, min, max) shapes over the
    // doc-grounded + co-occurrence KG — min violations anchor on the
    // typed-entity table so ABSENT facts surface as n_obj = 0 (see
    // kg.Ontology.shapeViolations)
    "q123_shape_violations" -> ((s, dir) => {
      val linked = Kg.disambiguate(
        Kg.candidates(kgMentions(s, dir), Kg.aliasDf(s)))
      graft.kg.Ontology.shapeViolations(s,
        Kg.triples(linked, NerSpark.Predicates).select("subj", "pred", "obj")
          .unionByName(cooccurFacts(linked)),
        linked.select(col("entity_id"), col("category").as("type")).distinct(),
        ShapeDecls)
    }),
    // dictionary-growth safety audit: per unresolved surface, the Shannon
    // entropy of its grounding distribution over q107's co-occurrence
    // evidence — low entropy surfaces are safe to append, high entropy
    // ones stay on the context path (see kg.Kg.aliasAmbiguity)
    "q124_alias_ambiguity" -> ((s, dir) => {
      import s.implicits._
      val reduced = graft.kg.Kg.Aliases
        .filterNot { case (a, _, _) => MinedSurfaces(a) }
        .toDF("alias", "entity_id", "score")
      val cand = Kg.candidates(kgMentions(s, dir), reduced)
      graft.kg.Kg.aliasAmbiguity(
        cand.filter(col("entity_id").isNull)
          .select(col("doc_id"), col("surface")),
        Kg.disambiguate(cand).select(col("doc_id"), col("entity_id")))
    }),
    // blocking/matching evaluation over q79's sorted-neighborhood run:
    // pairs completeness, pairs quality, reduction ratio against the
    // known clean↔dirty twin gold — the Christen TKDE'12 triple that
    // justifies (or indicts) a blocking strategy before it ships (see
    // text.ErMatch.evalBlocking)
    "q125_er_blocking_eval" -> ((s, dir) => {
      val records = erRecords(s, dir)
      val gold = t(s, dir, "customer").select(
        (col("c_custkey") * 2).as("id_a"),
        (col("c_custkey") * 2 + 1).as("id_b"))
      graft.text.ErMatch.evalBlocking(
        graft.text.ErMatch.sortedNeighborhood(records, ErWindow, ErMaxDist)
          .select("id_a", "id_b"),
        gold, records)
    }),
    // SPARQL FILTER + VALUES over the generic BGP compiler: a 3-pattern
    // provenance query narrowed by an inline VALUES binding (compiles to
    // a scan-pushable IN), a variable-variable comparison, and a
    // variable-constant one (see kg.TriplePatterns.bgpWhere)
    "q127_bgp_filter_values" -> ((s, dir) => {
      val meta = t(s, dir, "documents").select(
        concat(lit("doc://"), col("doc_id").cast("string")).as("subj"),
        lit("from_source").as("pred"),
        col("source").as("obj"))
      graft.kg.TriplePatterns.bgpWhere(
        kgTriples(s, dir).unionByName(meta),
        Seq(("?a", "performs", "?d"), ("?b", "consumes", "?d"),
          ("?d", "from_source", "?src")),
        Seq(("?a", "<", "?b"), ("?src", "!=", "src7")),
        Map("?a" -> Seq("ent:merge", "ent:sort", "ent:table_scan")))
    }),
    // cardinality-shape induction: the observed (type, pred) envelope
    // [cnt_min, cnt_max] + exact-micro mean over the same usage union
    // q123 audits — mine the shapes, then declare them (see
    // kg.Ontology.induceShapes)
    "q131_shape_induction" -> ((s, dir) => {
      val linked = Kg.disambiguate(
        Kg.candidates(kgMentions(s, dir), Kg.aliasDf(s)))
      graft.kg.Ontology.induceShapes(
        Kg.triples(linked, NerSpark.Predicates).select("subj", "pred", "obj")
          .unionByName(cooccurFacts(linked)),
        linked.select(col("entity_id"), col("category").as("type")).distinct())
    }),
    // labeled-embedding coherence audit: per label, the 5 vectors least
    // cosine-similar to their label centroid — the mislabeled-candidate
    // worklist a labeling pass hands back for review (see
    // sim.LabelCoherence)
    "q132_label_outliers" -> ((s, dir) =>
      graft.sim.LabelCoherence.outliers(t(s, dir, "embeddings"), OutlierK)),
    // SPARQL UNION: heterogeneous branches — performs-groundings beside
    // consumes-groundings carrying their page source; the unshared ?src
    // null-pads in branch 1 per the spec's bag-union disjunction (see
    // kg.TriplePatterns.bgpUnion)
    "q133_bgp_union" -> ((s, dir) => {
      val meta = t(s, dir, "documents").select(
        concat(lit("doc://"), col("doc_id").cast("string")).as("subj"),
        lit("from_source").as("pred"),
        col("source").as("obj"))
      graft.kg.TriplePatterns.bgpUnion(
        kgTriples(s, dir).unionByName(meta),
        Seq(
          Seq(("?e", "performs", "?d")),
          Seq(("?e", "consumes", "?d"), ("?d", "from_source", "?src"))))
    }),
    // SPARQL GROUP BY + HAVING + ORDER/LIMIT: the busiest performers by
    // distinct grounded page, with the page range — one hash-aggregate
    // over the BGP, top-10 planned as TakeOrderedAndProject (see
    // kg.TriplePatterns.bgpAggregate)
    "q134_bgp_aggregate" -> ((s, dir) =>
      graft.kg.TriplePatterns.bgpAggregate(kgTriples(s, dir),
        Seq(("?e", "performs", "?d")),
        groupBy = Seq("?e"),
        aggs = Seq(("count", "?d", "n_pages"),
          ("min", "?d", "first_page"), ("max", "?d", "last_page")),
        having = Seq(("n_pages", ">=", 2L)),
        orderBy = Seq("-n_pages", "e"),
        limit = Some(10))),
    // HITS hubs & authorities on the directed entity→page grounding
    // graph — Kleinberg's bipartite setting verbatim: hub entities
    // ground many authoritative pages. Exact BIGINT-micro arithmetic
    // with max-normalization, 3 full rounds (see kg.Hits)
    "q135_hits" -> ((s, dir) =>
      graft.kg.Hits.run(
        kgTriples(s, dir).select(col("subj").as("src"), col("obj").as("dst")),
        HitsIters)
        // DOUBLE on the wire: DuckDB's BIGINT sum() widens to HUGEINT, so
        // the oracle's scores surface as float64 at the compare layer
        // while BIGINT surfaces as int64 — value-equal, but a value hash
        // sees "1000000" vs "1000000.0" (the only red q135 left in
        // CORRECTNESS_r05). The scores are micro-integers ≤ 10⁶, exactly
        // representable in a double, so the cast is lossless; the
        // arithmetic underneath stays exact BIGINT.
        .select(col("node"), col("hub_micro").cast("double").as("hub_micro"),
          col("auth_micro").cast("double").as("auth_micro"))),
    // SPARQL CONSTRUCT: the derived-predicate rewrite — operations
    // co-grounded with data on the same page become first-class
    // `processes`/`processed_by` facts plus a provenance edge, emitted
    // as an RDF graph (set semantics) ready to union back into the
    // snapshot (see kg.TriplePatterns.bgpConstruct)
    "q136_bgp_construct" -> ((s, dir) =>
      graft.kg.TriplePatterns.bgpConstruct(kgTriples(s, dir),
        Seq(("?a", "performs", "?d"), ("?b", "consumes", "?d")),
        Seq(("?a", "processes", "?b"), ("?b", "processed_by", "?a"),
          ("?a", "grounded_in", "?d")))),
    // SPARQL GROUP_CONCAT: per data entity, the `|`-joined sorted set of
    // pages grounding it beside the count — the spec leaves concat order
    // undefined, this engine pins DISTINCT+sorted so the cell is
    // byte-reproducible (see kg.TriplePatterns.bgpAggregate)
    "q137_bgp_group_concat" -> ((s, dir) =>
      graft.kg.TriplePatterns.bgpAggregate(kgTriples(s, dir),
        Seq(("?e", "consumes", "?d")),
        groupBy = Seq("?e"),
        aggs = Seq(("group_concat", "?d", "pages"),
          ("count", "?d", "n_pages")))),
    // strongly connected components over the md5-oriented, md5-thinned
    // parts subgraph (the q47 bucket primitive supplies BOTH the edge
    // keep-gate and the orientation, so the oracle re-derives the exact
    // graph): cycle knots + DAG fringe — one giant SCC, small cycles,
    // and trim-path singletons all present at verify scale (see kg.Scc)
    "q138_scc" -> ((s, dir) =>
      graft.kg.Scc.run(s, sccEdges(s, dir))),
    // critical-path layering of the repeat co-purchase DAG: layer(v) =
    // longest incoming path, the topological level order per-layer
    // passes schedule by; non-convergence IS the cycle detector (see
    // kg.Dag.longestPathLayers)
    "q139_dag_layers" -> ((s, dir) =>
      graft.kg.Dag.longestPathLayers(s,
        copurchaseEdges(s, dir)
          .select(col("subj").as("src"), col("obj").as("dst")))),
    // Zipf rank-frequency head + the fitted log-log slope — the corpus
    // distribution health check next to q91's Heaps β (see quality.Zipf)
    "q140_zipf" -> ((s, dir) =>
      graft.quality.Zipf.rankFrequency(s, t(s, dir, "documents"), 100)),
    // TextRank keyword centrality: q41's PageRank loop over the distinct
    // word-adjacency graph — the graph-based twin of q54's TF-IDF; the
    // oracle unrolls the identical arithmetic via PageRank.oracleSql
    "q141_textrank" -> ((s, dir) =>
      graft.quality.TextRank.run(s, t(s, dir, "documents"), 10)),
    // SCD type-2 validity intervals over the customer order-status
    // change log: gaps-and-islands, every window partitioned by entity
    // (see kg.Scd2.history) — the batch twin of q85's fact scoping
    "q142_scd2_history" -> ((s, dir) =>
      graft.kg.Scd2.history(t(s, dir, "orders"),
        col("o_custkey"), col("o_orderstatus"),
        col("o_orderdate").cast("date"), col("o_orderkey"))),
    // two-sample KS drift between the doc-length distributions of the
    // two md5-bucket snapshot halves (the q47 split primitive chooses
    // sides, so the oracle re-derives them): the refresh-over-refresh
    // distribution monitor (see quality.Drift.ks)
    "q143_ks_drift" -> ((s, dir) =>
      graft.quality.Drift.ks(t(s, dir, "documents"),
        graft.core.Buckets.md5Bucket(col("doc_id"), 2),
        length(col("text")).cast("long"))),
    // landmark eccentricity over the thinned co-occurrence graph (q138's
    // derivation, undirected): the 4 smallest nodes BFS in ONE
    // synchronized frontier loop; max ecc lower-bounds the diameter
    // (see kg.Landmarks for the k-loops→one-loop collapse)
    "q144_eccentricity" -> ((s, dir) => {
      val canon = landmarkEdges(s, dir)
      graft.kg.Landmarks.eccentricity(s, canon,
        landmarkSeeds(canon), 6)
    }),
    // landmark harmonic centrality (Boldi–Vigna axioms; HyperBall's
    // estimator from a seed sample) with exact integer-micro reciprocals
    // so the per-node sum is order-independent — the q135 discipline
    "q145_harmonic" -> ((s, dir) => {
      val canon = landmarkEdges(s, dir)
      graft.kg.Landmarks.harmonic(s, canon,
        landmarkSeeds(canon), 6)
    }),
    // deterministic weighted systematic (PPS) sampling by n_chars: the
    // RNG-free fixed-size corpus subsample — interval-crossing picks over
    // the distributed prefix sum (see core.WeightedSample; shares
    // SequencePack.prefixOffsets with q30's packer)
    "q146_weighted_sample" -> ((s, dir) =>
      graft.core.WeightedSample.systematic(s,
        t(s, dir, "documents").select(col("doc_id"),
          col("n_chars").as("w")), 100)),
    // UNSUPERVISED truth discovery (Sums/TruthFinder family): q104's
    // claim stream resolved with NO gold — source trust and claim
    // confidence iterated to round 3 as exact integer micros (the q135
    // HITS discipline; see kg.Fusion.iterativeTruthMicro)
    "q147_truth_discovery" -> ((s, dir) =>
      graft.kg.Fusion.iterativeTruthMicro(weightedFusionClaims(s, dir), 3)),
    // k-truss backbone of the mod-5 co-occurrence graph: the EDGE peel
    // (support >= k-2 triangles) that a star's hub survives but its
    // edges don't — strictly stronger corroboration than q73's k-core
    // (see kg.KTruss; oracle unrolls the engine-measured round count)
    "q148_ktruss" -> ((s, dir) => {
      val (truss, rounds) = graft.kg.KTruss.trussWithRounds(
        s, mod5CooccurPairs(s, dir), KTrussK)
      KTrussRoundsMemo.put(dir, rounds)
      truss
    }),
    // landmark distance distribution + effective-diameter curve (the
    // HyperANF headline statistic, exact over the q144 landmark frame):
    // cumulative pair fraction per hop as integer micros
    "q149_distance_distribution" -> ((s, dir) => {
      val canon = landmarkEdges(s, dir)
      graft.kg.Landmarks.distanceDistribution(s, canon,
        landmarkSeeds(canon), 6)
    }),
    // SCC condensation DAG — the composition the q138 labeling exists
    // for: cross-component edge groups with multiplicity; acyclic by
    // construction, feeds q139's layering directly
    "q150_condensation" -> ((s, dir) =>
      graft.kg.Scc.condensation(s, sccEdges(s, dir))),
    // bounded-hop weighted SSSP from the landmark seeds: cheapest seed
    // per node under the lexicographic (dist, seed) path semiring —
    // the nearest-facility / Voronoi partition of the weighted graph
    "q151_weighted_sssp" -> ((s, dir) => {
      val w = weightedLandmarkEdges(s, dir)
      graft.kg.Sssp.nearestSeed(s, w, landmarkSeeds(w), 6)
    }),
    // Borůvka minimum spanning forest, unique under the (w, u, v) total
    // order — the cheapest connectivity-preserving backbone
    "q152_mst" -> ((s, dir) =>
      graft.kg.Mst.forest(s, weightedLandmarkEdges(s, dir))),
    // full directed reachability over the CYCLIC q138 graph via
    // Purdom's factorization: SCC collapse → semi-naive fixpoint on
    // the condensation DAG → expansion back to node pairs (SPARQL p+
    // proper — unbounded, where q116's closure is hop-capped)
    "q153_reachability" -> ((s, dir) =>
      graft.kg.Scc.reachability(s, sccEdges(s, dir))),
    // SPARQL DESCRIBE under symmetric CBD: all facts touching entities
    // that use tools — the entity-card query, over the q123 usage union
    "q154_bgp_describe" -> ((s, dir) => {
      val linked = Kg.disambiguate(
        Kg.candidates(kgMentions(s, dir), Kg.aliasDf(s)))
      val store = Kg.triples(linked, NerSpark.Predicates)
        .select("subj", "pred", "obj").unionByName(cooccurFacts(linked))
        .localCheckpoint() // scanned once per CBD leg — q112's rationale
      graft.kg.TriplePatterns.bgpDescribe(store,
        Seq(("?e", "uses_tool", "?d")), "?e")
    }),
    // SPARQL ASK: one boolean per probe — a predicate that exists and
    // one that cannot, both short-circuited via CollectLimit
    "q155_bgp_ask" -> ((s, dir) => {
      val linked = Kg.disambiguate(
        Kg.candidates(kgMentions(s, dir), Kg.aliasDf(s)))
      val store = Kg.triples(linked, NerSpark.Predicates)
        .select("subj", "pred", "obj").unionByName(cooccurFacts(linked))
        .localCheckpoint() // scanned once per ASK probe — q112's rationale
      val probe = (p: String) =>
        graft.kg.TriplePatterns.bgpAsk(store, Seq(("?e", p, "?d")))
          .select(lit(p).as("q"), col("ask"))
      probe("performs").unionByName(probe("defragments"))
    }),
    // Lloyd's k-means over the embedding table, exact-integer
    // quantized cells, k smallest vec_ids as seeds, 2 rounds — topic
    // bucketing / IVF coarse quantization (see sim.KMeans)
    "q156_kmeans" -> ((s, dir) =>
      graft.sim.KMeans.assign(s, t(s, dir, "embeddings"), 4, 2)),
    // SPARQL §11 numeric aggregates (SUM / AVG as exact integers) over
    // micro-encoded measurement literals joined to page provenance —
    // per-source quantity totals through the BGP compiler
    "q157_bgp_sum_avg" -> ((s, dir) => {
      val meas = graft.text.Literals.measurements(
        plantedMeasurementDocs(s, dir), "doc_id", "text")
      val qty = meas.filter(col("si_unit") === "m").select(
        concat(lit("doc://"), col("doc_id").cast("string")).as("subj"),
        lit("qty_m").as("pred"),
        col("value_si_micro").cast("string").as("obj")).distinct()
      val src = t(s, dir, "documents").select(
        concat(lit("doc://"), col("doc_id").cast("string")).as("subj"),
        lit("from_source").as("pred"), col("source").as("obj"))
      graft.kg.TriplePatterns.bgpAggregate(qty.unionByName(src),
        Seq(("?d", "qty_m", "?v"), ("?d", "from_source", "?src")),
        groupBy = Seq("?src"),
        aggs = Seq(("count", "?v", "n_vals"),
          ("sum", "?v", "total_micro"), ("avg", "?v", "avg_micro")))
    }),
    // HyperLogLog token-cardinality sketch: 64 integer-exact registers
    // + the raw estimate in micros — the mergeable distinct-count
    // primitive (see quality.Hll)
    "q158_hll_tokens" -> ((s, dir) =>
      graft.quality.Hll.tokenSketch(s, t(s, dir, "documents"))),
    // gaps-and-islands interval coalescing: per-user event validity
    // windows (deterministic duration from event_id) merged into
    // minimal disjoint extents — the temporal-KG canonicalization
    // beside q142's SCD2 (see kg.Intervals)
    "q159_interval_islands" -> ((s, dir) => {
      val sec = col("ts").cast("timestamp").cast("long")
      val iv = t(s, dir, "events").select(col("user_id"), col("event_id"),
        sec.as("s"), (sec + (col("event_id") % 300 + 60)).as("e"))
      graft.kg.Intervals.coalesceIslands(iv, "user_id", "event_id", "s", "e")
    }),
    // EXACT all-pairs set-similarity join by prefix filtering over
    // 3-gram shingle prints — the lossless counterpart of q15's LSH
    // (see dedup.SetSim; theorem-complete candidates, integer Jaccard)
    "q160_setsim_join" -> ((s, dir) =>
      graft.dedup.SetSim.join(s,
        graft.dedup.Decontam.gramFingerprints(t(s, dir, "documents"), 3)
          .select(col("doc_id"), col("gh").as("item")), 500000L)),
    // Bloom-filter join pre-filtering: bits built from the negative-
    // balance customer keys, orders probed BEFORE any shuffle; output
    // keeps the deterministic false positives visible (see core.Bloom)
    "q161_bloom_join" -> ((s, dir) => {
      val neg = t(s, dir, "customer").filter(col("c_acctbal") < 0)
        .select(col("c_custkey"))
      val bits = graft.core.Bloom.build(neg, "c_custkey", BloomBits, 3)
      val passed = graft.core.Bloom.mightContain(
        t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
        "o_custkey", bits, BloomBits, 3)
      passed.join(neg.select(col("c_custkey").as("o_custkey"),
          lit(false).as("is_fp")), Seq("o_custkey"), "left")
        .select(col("o_orderkey"), col("o_custkey"),
          coalesce(col("is_fp"), lit(true)).as("is_fp"))
    }),
    // ordered-step funnel: view → click → purchase within 7 days of
    // the previous step — per-user step times with NULL-preserving
    // drop-off (see events.Funnel)
    "q162_funnel" -> ((s, dir) =>
      graft.events.Funnel.run(t(s, dir, "events"),
        Seq("view", "click", "purchase"), 604800L)),
    // equi-depth histogram statistics over l_extendedprice: 16 buckets
    // from exact round-4 percentile boundaries, tie-stable assignment
    // by boundary count (see core.EquiDepth)
    "q163_equidepth_hist" -> ((s, dir) =>
      graft.core.EquiDepth.histogram(
        t(s, dir, "lineitem"), "l_extendedprice", 16)),
    // exact edit-distance-1 join over customer names via FastSS
    // deletion-neighborhood blocking — complete by theorem, verified
    // by codegen'd levenshtein (see text.EditJoin)
    "q164_editdist_join" -> ((s, dir) =>
      graft.text.EditJoin.pairs(t(s, dir, "customer"), "c_name")),
    // routing tree over the q151 distance frame: materialized next-hop
    // parents (min predecessor on the semiring arg-min), seeds NULL
    "q165_routing_tree" -> ((s, dir) => {
      val w = weightedLandmarkEdges(s, dir)
      graft.kg.Sssp.routingTree(s, w, landmarkSeeds(w), 6)
    }),
    // weight-biased deterministic walks: inverse-CDF neighbor choice
    // over cumulative weights, every md5 draw oracle-replayable
    "q166_weighted_walks" -> ((s, dir) =>
      graft.kg.RandomWalks.weightedWalks(s, weightedLandmarkEdges(s, dir),
        WalksPerNode, WalkSteps)),
    // 2-D Pareto skyline of (price, quantity), both minimized — the
    // two-phase bucketed sweep, no global window (see core.Skyline)
    "q167_skyline" -> ((s, dir) =>
      graft.core.Skyline.pareto(t(s, dir, "lineitem"),
        "l_extendedprice", "l_quantity")),
    // SPARQL §15 solution modifiers: DISTINCT + ORDER + OFFSET/LIMIT
    // paging with a determinism-extended sort key
    "q168_bgp_modifiers" -> ((s, dir) => {
      val linked = Kg.disambiguate(
        Kg.candidates(kgMentions(s, dir), Kg.aliasDf(s)))
      val store = Kg.triples(linked, NerSpark.Predicates)
        .select("subj", "pred", "obj").unionByName(cooccurFacts(linked))
        .localCheckpoint() // q112's rationale
      graft.kg.TriplePatterns.bgpSelect(store,
        Seq(("?e", "performs", "?d")), distinct = true,
        orderBy = Seq("-e", "d"), offset = 5, limit = Some(20))
    }),
    // rendezvous (HRW) shard routing: consistent assignment by salted
    // md5 argmax — one codegen'd expression, no shuffle
    "q169_rendezvous" -> ((s, dir) =>
      graft.core.Rendezvous.assign(
        t(s, dir, "documents").select(col("doc_id")), "doc_id",
        Seq("shard-a", "shard-b", "shard-c", "shard-d", "shard-e"))),
    // score-binned reliability table for the q72 classifier against
    // the planted language outcome (see quality.Calibration)
    "q170_calibration" -> ((s, dir) => {
      val scored = graft.quality.Classifier.score(s,
          t(s, dir, "documents"), 64)
        .join(t(s, dir, "documents").select(col("doc_id"), col("lang")),
          "doc_id")
        .withColumn("is_en", col("lang") === "en")
      graft.quality.Calibration.table(scored, "quality", "is_en", 10)
    }),
    // Luby's maximal independent set with deterministic md5 priorities
    // — the distributed symmetry-breaking primitive; rounds measured
    // and memoized for the oracle unroll (see kg.Mis)
    "q171_mis" -> ((s, dir) => {
      val (out, rounds) =
        graft.kg.Mis.misWithRounds(s, landmarkEdges(s, dir))
      MisRoundsMemo.put(dir, rounds)
      out
    }),
    // regular-path-query closure: (performs/^consumes)+ — one
    // pathSequence hop composed with the doubling fixpoint; the
    // entity-influence reachability an RPQ engine evaluates
    "q172_rpq_closure" -> ((s, dir) => {
      val hop = graft.kg.TriplePatterns.pathSequence(
        kgTriples(s, dir), Seq("performs", "^consumes"))
        .select(col("subj").as("src"), col("obj").as("dst"))
      graft.kg.TriplePatterns.closureFixpoint(hop)
    }),
    // HLL shard merge: sketch two md5 halves independently, merge by
    // register-wise max — the oracle is the WHOLE-CORPUS replay, so a
    // green row PROVES the merge law, not just the arithmetic
    "q173_hll_merge" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val half = graft.core.Buckets.md5Bucket(col("doc_id"), 2)
      graft.quality.Hll.merge(
        graft.quality.Hll.tokenSketch(s, docs.filter(half === 0)),
        graft.quality.Hll.tokenSketch(s, docs.filter(half === 1)))
    }),
    // Broder bow-tie census of the directed q138 graph: core / in /
    // out / other via component-level semi-joins against the
    // condensation closure (see kg.Scc.bowtie)
    "q174_bowtie" -> ((s, dir) =>
      graft.kg.Scc.bowtie(s, sccEdges(s, dir))),
    // weighted s-core: peel strength < 25 to fixpoint over the shared
    // weighted graph; measured rounds memoized for the oracle unroll
    "q175_score" -> ((s, dir) => {
      val (str, rounds) = graft.kg.KCore.strengthCoreWithRounds(s,
        weightedLandmarkEdges(s, dir), SCoreS)
      SCoreRoundsMemo.put(dir, rounds)
      str
    }),
    // SPARQL FILTER NOT EXISTS: operations on pages with NO actor
    // involvement — the correlated-negation half of the q119 MINUS pair
    // (they coincide here; they diverge on no-shared-variable groups,
    // which the spec suite pins — see kg.TriplePatterns.bgpExists)
    "q129_bgp_not_exists" -> ((s, dir) =>
      graft.kg.TriplePatterns.bgpExists(kgTriples(s, dir),
        Seq(("?e", "performs", "?d")),
        Seq(("?x", "involves", "?d")), negate = true)),
    // SPARQL FILTER EXISTS: tools on pages that also ground DATA — one
    // left-semi equi-join on the shared variable
    "q130_bgp_exists" -> ((s, dir) =>
      graft.kg.TriplePatterns.bgpExists(kgTriples(s, dir),
        Seq(("?e", "uses_tool", "?d")),
        Seq(("?b", "consumes", "?d")), negate = false)),
    // non-recursive SPARQL property path `(performs|uses_tool) /
    // ^(consumes|involves)`: OPERATION∪TOOL entities to the DATA∪ACTOR
    // entities grounded in the same page — sequence, inverse, and
    // alternation in one path, set semantics (see
    // kg.TriplePatterns.pathSequence)
    "q128_property_paths" -> ((s, dir) =>
      graft.kg.TriplePatterns.pathSequence(kgTriples(s, dir),
        Seq("performs|uses_tool", "^consumes|^involves"))),
    // KG → text linearization (the KELM corpus shape): each entity's
    // facts serialized into one byte-reproducible training document,
    // hub-capped per predicate with visible truncation (see
    // kg.Summarize.linearize)
    "q126_kg_linearize" -> ((s, dir) => {
      val linked = Kg.disambiguate(
        Kg.candidates(kgMentions(s, dir), Kg.aliasDf(s)))
      graft.kg.Summarize.linearize(
        Kg.triples(linked, NerSpark.Predicates).select("subj", "pred", "obj")
          .unionByName(cooccurFacts(linked)),
        LinearizeCap)
    }),
    // usage-based type inference (SDType): the UsageHeldOut entities are
    // stripped from the typed table and re-typed from predicate-usage
    // votes; `cooccurs_with` facts (per-doc entity pairs) supply the
    // mixed-distribution votes that make the method non-trivial (see
    // kg.Ontology.inferTypesByUsage)
    "q109_type_by_usage" -> ((s, dir) => {
      // linked feeds the co-occurrence self-join (2 legs), the typed
      // relation, and the triple extraction — checkpoint once
      val linked = Kg.disambiguate(
        Kg.candidates(kgMentions(s, dir), Kg.aliasDf(s))).localCheckpoint()
      val ents = linked
        .select(col("doc_id"), col("entity_id"), col("category")).distinct()
      val co = ents.as("a")
        .join(ents.as("b"), col("a.doc_id") === col("b.doc_id") &&
          col("a.entity_id") =!= col("b.entity_id"))
        .select(col("a.entity_id").as("subj"),
          lit("cooccurs_with").as("pred"), col("b.entity_id").as("obj"))
        .distinct()
      val typed = ents.select("entity_id", "category").distinct()
        .filter(!col("entity_id").isin(UsageHeldOut: _*))
      graft.kg.Ontology.inferTypesByUsage(
        Kg.triples(linked, NerSpark.Predicates).select("subj", "pred", "obj")
          .unionByName(co),
        typed)
    }),
    // VoID class-property completeness profile over the q80 type closure:
    // per (type, pred) — how many typed subjects exist, how many carry
    // the predicate, and the coverage ratio the next extraction round
    // would target (see kg.Ontology.completenessProfile)
    "q110_completeness" -> ((s, dir) => {
      val linked = Kg.disambiguate(
        Kg.candidates(kgMentions(s, dir), Kg.aliasDf(s)))
      val types = graft.kg.Ontology.inferTypes(s,
        linked.select(col("entity_id"), col("category")).distinct(),
        ClassHierarchy)
      graft.kg.Ontology.completenessProfile(
        Kg.triples(linked, NerSpark.Predicates), types)
    }),
    // JSONL round-trip — the interchange format training corpora actually
    // ship in: write the documents table as JSON Lines (native writer,
    // splittable line-per-record at scale), read it back under the
    // original schema, and join against the source to prove per-row
    // losslessness (text_ok must be true on EVERY row for the oracle hash
    // to match). The write happens once per sf dir (_SUCCESS-gated reuse).
    "q59_jsonl_roundtrip" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // path keyed by source mtime+size so a regenerated table invalidates
      // the reuse; the copy is sf-dir-sized (MBs), not bench-corpus-sized
      val src = new java.io.File(s"$dir/documents.parquet")
      val out = s"${graft.core.TmpFs.base}/graft-jsonl-" +
        s"${dir.replaceAll("[^A-Za-z0-9.]", "_")}-${src.lastModified}-${src.length}"
      // per-pid staging + atomic rename: concurrent JVMs can't tear the copy
      graft.core.TmpFs.ensureShared(out) { staging =>
        docs.repartition(4).write.mode("overwrite").json(staging)
      }
      val back = s.read.schema(docs.schema).json(out)
        .select(col("doc_id"), col("text").as("text_back"),
          col("n_chars").as("n_chars_back"))
      docs.join(back, "doc_id")
        .select(col("doc_id"),
          (col("text") === col("text_back") &&
            col("n_chars") === col("n_chars_back")).as("text_ok"),
          col("n_chars"))
    }),
    // ---- BRAT standoff source over the real reference corpora (SURVEY §2
    // op 1; these read /root/reference/datasets, not the sf dir) ----
    "q33_brat_stats" -> ((s, _) => graft.sources.Brat.statistics(s)),
    "q34_brat_gold" -> ((s, _) => {
      graft.sources.Brat.loadAll(s)
        .select(col("dataset"), explode(col("gold")).as("g"))
        .groupBy(col("dataset"), col("g.category").as("category"))
        .agg(count(lit(1)).as("n_mentions"))
    }),
    "q35_tsv_gold" -> ((s, _) => graft.sources.Brat.loadTsv(s,
      "/root/reference/datasets/multicardioner-track2/en/tsv/" +
        "multicardioner_track2_cardioccc_test_en.tsv")),
    // macro (per-document mean) metrics — reference op 18; with pred == gold
    // every doc with ≥1 mention scores 1.0 and mention-free docs score 0.0,
    // so the macro average equals the hit fraction (oracle below)
    "q27_ner_macro" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val m = kgMentions(s, dir)
      NerSpark.macroMetrics(s, docs, m, m)
        .select(round(col("macro_precision"), 4).as("macro_precision"),
          round(col("macro_recall"), 4).as("macro_recall"),
          round(col("macro_f1"), 4).as("macro_f1"))
    }))

  // ---- bound-parameterized oracle builders -------------------------------
  //
  // DuckDB 1.0 has no lateral generate_series(column), so position scans use
  // a fixed-bound series joined on `j <= length(...)`. A static bound can
  // silently UNDER-COUNT if fixtures ever grow past it — so the static
  // [[oracleSql]] uses conservative defaults while [[oracleSqlFor]] derives
  // each bound from the actual table maxima (the gate then cannot weaken as
  // data grows: a doc longer than the bound raises the bound with it).

  /** q75: wedge-enumeration replay with the given center cap; CTEs
    * MATERIALIZED so DuckDB 1.0 doesn't exponentially inline the
    * multiply-referenced edge/degree relations. */
  private def linkPredSql(cap: Long): String =
    s"""WITH edges AS MATERIALIZED ($KCoreEdgesSql),
       | und AS MATERIALIZED (SELECT u AS w, v AS n FROM edges
       |   UNION ALL SELECT v AS w, u AS n FROM edges),
       | deg AS MATERIALIZED (SELECT w, count(*) AS d FROM und GROUP BY w),
       | ctr AS (SELECT und.w, und.n, deg.d FROM und JOIN deg USING (w)
       |         WHERE deg.d <= $cap),
       | wedge AS (SELECT a.n AS e1, b.n AS e2, 1.0 / ln(a.d) AS aw
       |           FROM ctr a JOIN ctr b ON a.w = b.w AND a.n < b.n),
       | sc AS MATERIALIZED (SELECT e1, e2, count(*) AS n_common,
       |         sum(aw) AS aa_raw
       |       FROM wedge GROUP BY e1, e2
       |       HAVING count(*) >= $LinkPredMinCommon),
       | noedge AS (SELECT sc.* FROM sc LEFT JOIN edges
       |            ON sc.e1 = edges.u AND sc.e2 = edges.v
       |            WHERE edges.u IS NULL)
       | SELECT e1, e2, n_common,
       |  round(n_common / (d1.d + d2.d - n_common), 4) AS jaccard,
       |  round(aa_raw, 4) AS score_aa
       | FROM noedge JOIN deg d1 ON d1.w = noedge.e1
       | JOIN deg d2 ON d2.w = noedge.e2""".stripMargin.replaceAll("\n", " ")

  /** q122: the held-out ranking evaluation — the shared md5-bucket split,
    * q75's wedge replay on the TRAIN edges only, the identical
    * `(n_common desc, e2 asc)` rank window, and per-term integer-rounded
    * reciprocal ranks (the sum is cast back from DuckDB's HUGEINT). */
  private def linkPredEvalSql(cap: Long): String =
    s"""WITH edges AS MATERIALIZED ($KCoreEdgesSql),
       | keyed AS (SELECT u, v,
       |   ('0x' || substr(md5(u::varchar || ':' || v::varchar), 1, 8))::BIGINT
       |     % $LinkPredEvalMod AS hb FROM edges),
       | held AS (SELECT u, v FROM keyed WHERE hb = $LinkPredEvalBucket),
       | tre AS MATERIALIZED (SELECT u, v FROM keyed
       |   WHERE hb <> $LinkPredEvalBucket),
       | und AS MATERIALIZED (SELECT u AS w, v AS n FROM tre
       |   UNION ALL SELECT v AS w, u AS n FROM tre),
       | deg AS MATERIALIZED (SELECT w, count(*) AS d FROM und GROUP BY w),
       | ctr AS (SELECT und.w, und.n FROM und JOIN deg USING (w)
       |         WHERE deg.d <= $cap),
       | sc AS MATERIALIZED (SELECT a.n AS e1, b.n AS e2, count(*) AS n_common
       |       FROM ctr a JOIN ctr b ON a.w = b.w AND a.n < b.n
       |       GROUP BY 1, 2 HAVING count(*) >= $LinkPredMinCommon),
       | noedge AS (SELECT sc.* FROM sc LEFT JOIN tre
       |            ON sc.e1 = tre.u AND sc.e2 = tre.v
       |            WHERE tre.u IS NULL),
       | ranked AS (SELECT e1, e2, row_number() OVER
       |   (PARTITION BY e1 ORDER BY n_common DESC, e2 ASC) AS r
       |  FROM noedge),
       | j AS (SELECT h.u, h.v, rk.r FROM held h
       |   LEFT JOIN ranked rk ON rk.e1 = h.u AND rk.e2 = h.v)
       | SELECT count(*) AS n_holdout, count(r) AS n_ranked,
       |  coalesce(sum(round(1000000.0 / r)::bigint), 0)::bigint
       |    AS mrr_micro_sum,
       |  count(CASE WHEN r <= 1 THEN 1 END) AS n_hits1,
       |  count(CASE WHEN r <= 3 THEN 1 END) AS n_hits3,
       |  count(CASE WHEN r <= 10 THEN 1 END) AS n_hits10
       | FROM j""".stripMargin.replaceAll("\n", " ")

  /** q118: measurement extraction replay — group-indexed
    * regexp_extract_all lists zipped by a fixed-bound series, then CASE
    * ladders BUILT FROM the engine's own [[graft.text.Literals.UnitMicros]]
    * table (so unit math cannot drift); the planted quantities mirror the
    * query's construction verbatim. */
  private def measurementsSql(mBound: Long): String = {
    val pat = graft.text.Literals.Pattern
    val siCase = graft.text.Literals.UnitMicros
      .map { case (u, b, _) => s"WHEN '$u' THEN '$b'" }
      .mkString("CASE unit ", " ", " END")
    val facCase = graft.text.Literals.UnitMicros
      .map { case (u, _, f) => s"WHEN '$u' THEN $f" }
      .mkString("CASE unit ", " ", " END")
    s"""WITH planted AS (SELECT doc_id,
       |  text || ' dist 1,' || lpad((doc_id % 1000)::varchar, 3, '0') ||
       |  ' km mass ' || (doc_id % 90) || '.5 kg took ' || (doc_id % 250) ||
       |  'ms len ' || (doc_id % 40) || ' m' AS text FROM documents),
       | ex AS (SELECT doc_id,
       |   regexp_extract_all(text, '$pat', 1) AS nums,
       |   regexp_extract_all(text, '$pat', 2) AS units FROM planted),
       | z AS (SELECT doc_id, (g.i - 1)::bigint AS m_idx,
       |   nums[g.i] AS raw_value, units[g.i] AS unit
       |  FROM ex JOIN generate_series(1, $mBound) g(i) ON g.i <= len(nums))
       | SELECT doc_id, m_idx, raw_value, unit, $siCase AS si_unit,
       |  round(replace(raw_value, ',', '')::double * ($facCase))::bigint
       |    AS value_si_micro
       | FROM z""".stripMargin.replaceAll("\n", " ")
  }

  /** q90: add-1-smoothed bigram LM replay — the bigram stream comes from a
    * fixed-bound position series (no lateral series in DuckDB 1.0), then
    * the same corpus counts and per-doc average as the engine. */
  private def bigramSql(bound: Long): String =
    s"""WITH tl AS (SELECT doc_id,
       |   list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS l
       |  FROM documents),
       | big AS (SELECT doc_id, l[g.i] AS w1, l[g.i + 1] AS w2
       |   FROM tl JOIN generate_series(1, $bound) g(i) ON g.i <= len(l) - 1),
       | cb AS (SELECT w1, w2, count(*) AS cb FROM big GROUP BY 1, 2),
       | cu AS (SELECT w1, count(*) AS cu FROM big GROUP BY 1),
       | v AS (SELECT count(DISTINCT x) AS v
       |       FROM (SELECT unnest(l) AS x FROM tl))
       | SELECT b.doc_id, count(*) AS n_bigrams,
       |  round(avg(ln((cb.cb + 1.0) / (cu.cu + v.v))), 4) AS avg_logprob
       | FROM big b JOIN cb ON b.w1 = cb.w1 AND b.w2 = cb.w2
       | JOIN cu ON b.w1 = cu.w1 CROSS JOIN v
       | GROUP BY b.doc_id""".stripMargin.replaceAll("\n", " ")

  /** q10/q26: dictionary span grounding via a substring position scan. */
  private def nerMentionsSql(posBound: Long): String =
    s"""WITH dict(category, surface) AS $DictValues,
       | pos AS (SELECT j FROM generate_series(1, $posBound) g(j))
       | SELECT d.doc_id, v.category, v.surface, (p.j - 1)::int AS begin_c,
       |  (p.j - 1 + length(v.surface))::int AS end_c
       | FROM documents d CROSS JOIN dict v
       | JOIN pos p ON p.j <= length(d.text) - length(v.surface) + 1
       | WHERE substr(d.text, p.j, length(v.surface)) = v.surface"""
      .stripMargin.replaceAll("\n", " ")

  /** q44: the native find-all expression on the 'spark' needle. */
  private def findAllSql(posBound: Long): String =
    s"""SELECT doc_id, (g.j - 1)::int AS begin_c, (g.j - 1 + 5)::int AS end_c
       | FROM documents JOIN generate_series(1, $posBound) g(j)
       |   ON g.j <= length(text) - 4
       | WHERE substr(text, g.j, 5) = 'spark'"""
      .stripMargin.replaceAll("\n", " ")

  /** q21: trigram language-ID (bound covers the normalized ` text ` form,
    * which whitespace-collapse keeps ≤ length(text) + 2). */
  private def langidSql(triBound: Long): String =
    s"""WITH prof(lang, g) AS $LangProfileValues,
       | norm AS (SELECT doc_id,
       |  ' ' || array_to_string(string_split_regex(trim(lower(text)), '\\s+'), ' ') || ' ' AS t
       |  FROM documents),
       | tg AS (SELECT n.doc_id, substr(n.t, s.j, 3) AS g
       |  FROM norm n JOIN generate_series(1, $triBound) s(j) ON s.j <= length(n.t) - 2),
       | hits AS (SELECT t.doc_id, p.lang, count(*) AS c
       |  FROM tg t JOIN prof p ON t.g = p.g GROUP BY 1, 2),
       | best AS (SELECT doc_id, lang,
       |  row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, lang ASC) AS rn FROM hits)
       | SELECT d.doc_id, coalesce(b.lang, 'und') AS pred_lang, d.lang AS labeled_lang
       | FROM documents d
       | LEFT JOIN (SELECT doc_id, lang FROM best WHERE rn = 1) b ON d.doc_id = b.doc_id"""
      .stripMargin.replaceAll("\n", " ")

  /** q25: pseudo-frame sampling (bound = max frame count = ⌈bytes/64⌉). */
  private def frameSampleSql(frameBound: Long): String =
    s"""WITH d AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
       | frames AS (SELECT doc_id, g.j - 1 AS fi, n,
       |   CAST(ceil(n / 64.0) AS INT) AS nf
       |  FROM d JOIN generate_series(1, $frameBound) g(j) ON g.j <= CAST(ceil(n / 64.0) AS INT))
       | SELECT doc_id AS id, fi::int AS frame_idx,
       |  (CASE WHEN fi = nf - 1 THEN n - 64 * (nf - 1) ELSE 64 END)::int AS frame_bytes
       | FROM frames WHERE fi % 2 = 0""".stripMargin.replaceAll("\n", " ")

  /** q15: full MinHash-LSH replay. The shingle CTE mirrors the engine's
    * `shingleStrings` degenerate branches exactly: a single-token doc's one
    * token IS its shingle (UNION ALL arm), and an empty/whitespace-only doc
    * (DuckDB splits '' to ['']) contributes no shingles — matching the
    * engine-side skip of empty shingle sets. */
  /** The MinHash signature chain up to `sig(doc_id, i, h)` / `band(doc_id,
    * band, key)` — shared by the self-join pair oracles (q15/q61) and the
    * cross-sided delta oracle (q64). */
  private def minhashSigCtes(tokBound: Long): String =
    s"""coeffs(i, a, b) AS ${graft.dedup.Dedup.coeffsValues},
       | toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
       |          FROM documents),
       | sh AS (SELECT DISTINCT doc_id, s FROM (
       |   SELECT doc_id, t[g.j] || ' ' || t[g.j+1] AS s
       |   FROM toks JOIN generate_series(1, $tokBound) g(j) ON g.j < len(t)
       |   UNION ALL
       |   SELECT doc_id, t[1] AS s FROM toks WHERE len(t) = 1 AND t[1] <> '')),
       | x AS (SELECT doc_id,
       |        ('0x' || substr(md5(s),1,8))::BIGINT % 2147483647 AS x FROM sh),
       | sig AS (SELECT doc_id, c.i, min((c.a * x.x + c.b) % 2147483647) AS h
       |         FROM x CROSS JOIN coeffs c GROUP BY doc_id, c.i),
       | band AS (SELECT doc_id, i // 4 AS band,
       |           string_agg(h, ',' ORDER BY i) AS key
       |          FROM sig GROUP BY doc_id, i // 4)""".stripMargin

  /** The MinHash-LSH CTE chain up to `est(doc_a, doc_b, e)` — shared by
    * the pair oracle (q15) and the cluster-collapse oracle (q61). */
  private def minhashEstCtes(tokBound: Long): String =
    s"""${minhashSigCtes(tokBound)},
       | cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |          FROM band a JOIN band b
       |            ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       | est AS (SELECT c.doc_a, c.doc_b,
       |           sum(CASE WHEN sa.h = sb.h THEN 1 ELSE 0 END) / 64.0 AS e
       |         FROM cand c JOIN sig sa ON sa.doc_id = c.doc_a
       |           JOIN sig sb ON sb.doc_id = c.doc_b AND sb.i = sa.i
       |         GROUP BY c.doc_a, c.doc_b)""".stripMargin

  private def minhashSql(tokBound: Long): String =
    s"""WITH ${minhashEstCtes(tokBound)}
       | SELECT doc_a, doc_b, round(e, 4) AS est_jaccard
       | FROM est WHERE e >= 0.1""".stripMargin.replaceAll("\n", " ")

  /** q61: full cluster-collapse replay — LSH pairs at est ≥ 0.5 become an
    * undirected graph, components labeled by recursive min-label
    * propagation, winner = the cluster's min doc_id; singletons are their
    * own winner (LEFT JOIN + coalesce). */
  private def clustersSql(tokBound: Long): String =
    s"""WITH RECURSIVE ${minhashEstCtes(tokBound)},
       | p AS (SELECT doc_a, doc_b FROM est WHERE e >= 0.5),
       | sym AS (SELECT doc_a AS src, doc_b AS dst FROM p
       |         UNION SELECT doc_b, doc_a FROM p),
       | cc(node, label) AS (
       |   SELECT src, src FROM sym
       |   UNION
       |   SELECT s.dst, c.label FROM cc c JOIN sym s ON s.src = c.node),
       | comp AS (SELECT node, min(label) AS cluster_id FROM cc GROUP BY node)
       | SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id,
       |  (coalesce(c.cluster_id, d.doc_id) = d.doc_id) AS is_winner
       | FROM documents d LEFT JOIN comp c ON c.node = d.doc_id"""
      .stripMargin.replaceAll("\n", " ")

  /** q117: the q61 cluster replay composed with the dictionary-linked
    * fact stream — facts re-grounded on each doc's cluster representative
    * and collapsed with a distinct-source count. */
  private def sameAsSql(tokBound: Long): String =
    s"""WITH RECURSIVE dict(category, surface, entity_id) AS $AliasValues,
       | ${minhashEstCtes(tokBound)},
       | p AS (SELECT doc_a, doc_b FROM est WHERE e >= 0.5),
       | sym AS (SELECT doc_a AS src, doc_b AS dst FROM p
       |         UNION SELECT doc_b, doc_a FROM p),
       | cc(node, label) AS (
       |   SELECT src, src FROM sym
       |   UNION
       |   SELECT s.dst, c.label FROM cc c JOIN sym s ON s.src = c.node),
       | comp AS (SELECT node, min(label) AS cluster_id FROM cc GROUP BY node),
       | clu AS (SELECT d.doc_id,
       |   coalesce(c.cluster_id, d.doc_id) AS cluster_id
       |  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id),
       | facts AS (SELECT DISTINCT dict.entity_id AS subj, $PredCase AS pred,
       |   d.doc_id FROM documents d CROSS JOIN dict
       |  WHERE position(surface in d.text) > 0)
       | SELECT f.subj, f.pred, 'doc://' || clu.cluster_id AS obj,
       |  count(DISTINCT f.doc_id) AS n_sources
       | FROM facts f JOIN clu ON clu.doc_id = f.doc_id
       | GROUP BY 1, 2, 3""".stripMargin.replaceAll("\n", " ")

  /** Shared q62/q63 CTE chain: fixed 3-token spans, md5 fingerprints,
    * corpus-wide distinct-doc df. */
  private def lineDedupCtes(spanBound: Long): String =
    s"""toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
       |  FROM documents),
       | sp AS (SELECT doc_id, g.j - 1 AS line_idx,
       |   list_aggregate(t[(g.j-1)*3+1 : g.j*3], 'string_agg', ' ') AS ln
       |  FROM toks JOIN generate_series(1, $spanBound) g(j) ON (g.j-1)*3 < len(t)),
       | nz AS (SELECT doc_id, line_idx, ln FROM sp WHERE ln <> ''),
       | dfc AS (SELECT md5(ln) AS fp, count(DISTINCT doc_id) AS line_df
       |         FROM nz GROUP BY 1)""".stripMargin

  /** q62: span-level corpus dedup replay — keep = df ≤ 2. */
  private def lineDedupSql(spanBound: Long): String =
    s"""WITH ${lineDedupCtes(spanBound)}
       | SELECT nz.doc_id, nz.line_idx::int AS line_idx, md5(nz.ln) AS fp,
       |  dfc.line_df, (dfc.line_df <= 2) AS keep
       | FROM nz JOIN dfc ON md5(nz.ln) = dfc.fp"""
      .stripMargin.replaceAll("\n", " ")

  /** q64: incremental delta-dedup replay — corpus/batch by the shared md5
    * bucket (90/10), exact via fingerprint left join, near via the
    * cross-sided LSH chain (batch bands × corpus bands), exact beating
    * near, min-corpus-doc attribution. */
  private def deltaSql(tokBound: Long): String =
    s"""WITH ${minhashSigCtes(tokBound)},
       | hsplit AS (SELECT doc_id,
       |   ('0x' || substr(md5(doc_id::varchar), 1, 8))::BIGINT % 100 AS hb
       |  FROM documents),
       | corpus AS (SELECT d.doc_id, d.text FROM documents d
       |   JOIN hsplit s ON s.doc_id = d.doc_id AND s.hb < 90),
       | batch AS (SELECT d.doc_id, d.text FROM documents d
       |   JOIN hsplit s ON s.doc_id = d.doc_id AND s.hb >= 90),
       | cfp AS (SELECT md5(text) AS fp, min(doc_id) AS exact_of
       |         FROM corpus GROUP BY 1),
       | bx AS (SELECT b.doc_id, c.exact_of
       |   FROM (SELECT doc_id, md5(text) AS fp FROM batch) b
       |   LEFT JOIN cfp c ON b.fp = c.fp),
       | cand AS (SELECT DISTINCT bb.doc_id AS batch_doc, cb.doc_id AS corpus_doc
       |   FROM band bb JOIN band cb ON bb.band = cb.band AND bb.key = cb.key
       |   JOIN batch ON batch.doc_id = bb.doc_id
       |   JOIN corpus ON corpus.doc_id = cb.doc_id),
       | est AS (SELECT c.batch_doc, c.corpus_doc,
       |    sum(CASE WHEN sa.h = sb.h THEN 1 ELSE 0 END) / 64.0 AS e
       |   FROM cand c JOIN sig sa ON sa.doc_id = c.batch_doc
       |    JOIN sig sb ON sb.doc_id = c.corpus_doc AND sb.i = sa.i
       |   GROUP BY 1, 2),
       | near AS (SELECT batch_doc AS doc_id, min(corpus_doc) AS near_of
       |   FROM est WHERE e >= 0.5 GROUP BY 1)
       | SELECT bx.doc_id,
       |  CASE WHEN bx.exact_of IS NOT NULL THEN 'exact_dup'
       |       WHEN n.near_of IS NOT NULL THEN 'near_dup' ELSE 'new' END AS status,
       |  coalesce(bx.exact_of, n.near_of) AS dup_of
       | FROM bx LEFT JOIN near n ON n.doc_id = bx.doc_id"""
      .stripMargin.replaceAll("\n", " ")

  /** q65: PII scrub replay — the planted-PII synthesis and the three
    * patterns are interpolated from the ENGINE's own constants
    * ([[graft.quality.Pii]]), so oracle and engine cannot drift. */
  private def piiSql: String = {
    val e = graft.quality.Pii.EmailRe
    val i = graft.quality.Pii.Ipv4Re
    val p = graft.quality.Pii.PhoneRe
    s"""WITH planted AS (SELECT doc_id,
       |  text || ' contact user' || doc_id || '@example.com' ||
       |  CASE WHEN doc_id % 3 = 0 THEN ' from 10.0.' || (doc_id % 256) || '.' || (doc_id % 100) ELSE '' END ||
       |  CASE WHEN doc_id % 5 = 0 THEN ' call 555-' || lpad((doc_id % 1000)::varchar, 3, '0') || '-' || lpad((doc_id % 10000)::varchar, 4, '0') ELSE '' END AS text
       |  FROM documents)
       | SELECT doc_id,
       |  len(regexp_extract_all(text, '$e'))::int AS n_emails,
       |  len(regexp_extract_all(text, '$i'))::int AS n_ips,
       |  len(regexp_extract_all(text, '$p'))::int AS n_phones,
       |  regexp_replace(regexp_replace(regexp_replace(text,
       |    '$e', '<EMAIL>', 'g'), '$i', '<IP>', 'g'), '$p', '<PHONE>', 'g') AS redacted
       | FROM planted""".stripMargin.replaceAll("\n", " ")
  }

  /** q63: the STRIP half — rebuild each doc's text from surviving spans in
    * original order (docs whose every span is boilerplate drop out). */
  private def lineStripSql(spanBound: Long): String =
    s"""WITH ${lineDedupCtes(spanBound)},
       | kept AS (SELECT nz.doc_id, nz.line_idx, nz.ln
       |  FROM nz JOIN dfc ON md5(nz.ln) = dfc.fp WHERE dfc.line_df <= 2)
       | SELECT doc_id, string_agg(ln, ' ' ORDER BY line_idx) AS clean_text
       | FROM kept GROUP BY doc_id""".stripMargin.replaceAll("\n", " ")

  def oracleSql: Map[String, String] = Map(
    "q01_filter_project" ->
      "SELECT l_orderkey, l_partkey, l_quantity FROM lineitem WHERE l_quantity > 45",
    "q02_agg" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue, count(*) AS n_rows
        | FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin.replaceAll("\n", " "),
    "q03_doc_stats" ->
      """SELECT lang, count(*) AS n_docs, round(avg(n_chars),4) AS avg_chars,
        | round(stddev_pop(n_chars),4) AS std_chars
        | FROM documents GROUP BY lang""".stripMargin.replaceAll("\n", " "),
    "q04_rollup" ->
      "SELECT lang, count(*) AS n_docs FROM documents GROUP BY ROLLUP(lang)",
    "q05_broadcast_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice),2) AS total_price
        | FROM orders JOIN customer ON o_custkey = c_custkey
        | GROUP BY c_mktsegment""".stripMargin.replaceAll("\n", " "),
    "q06_window_top1" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        | FROM orders) WHERE rn = 1""".stripMargin.replaceAll("\n", " "),
    "q07_anti_join" ->
      """SELECT c_custkey FROM customer c
        | WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)"""
        .stripMargin.replaceAll("\n", " "),
    "q08_salted_join" ->
      """SELECT o_orderpriority, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
        | count(*) AS n_rows
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | GROUP BY o_orderpriority""".stripMargin.replaceAll("\n", " "),
    "q09_window_events" ->
      """SELECT (floor(epoch(ts)/300)*300)::bigint AS win_start, event_type,
        | count(*) AS n_events, round(sum(value),4) AS sum_value
        | FROM events GROUP BY 1, 2""".stripMargin.replaceAll("\n", " "),
    "q10_ner_mentions" -> nerMentionsSql(32768),
    "q11_ner_micro" ->
      s"""WITH dict(category, surface) AS $DictValues,
         | occ AS (SELECT d.doc_id, v.surface,
         |  (length(d.text) - length(replace(d.text, v.surface, ''))) // length(v.surface) AS n,
         |  len(string_split(v.surface, ' ')) AS tok
         |  FROM documents d CROSS JOIN dict v)
         | SELECT sum(n * tok)::double AS tp, 0.0::double AS fp, 0.0::double AS fn,
         |  1.0::double AS precision, 1.0::double AS recall, 1.0::double AS f1
         | FROM occ""".stripMargin.replaceAll("\n", " "),
    "q12_triples" ->
      s"""WITH dict(category, surface, entity_id) AS $AliasValues
         | SELECT DISTINCT entity_id AS subj, $PredCase AS pred,
         |  'doc://' || d.doc_id AS obj
         | FROM documents d CROSS JOIN dict
         | WHERE position(surface in d.text) > 0""".stripMargin.replaceAll("\n", " "),
    "q13_connected_components" ->
      s"""WITH RECURSIVE dict(category, surface, entity_id) AS $AliasValues,
         | edges AS (SELECT DISTINCT 'd:' || d.doc_id AS src, entity_id AS dst
         |  FROM documents d CROSS JOIN dict
         |  WHERE d.doc_id % 7 = 0 AND position(surface in d.text) > 0),
         | sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
         | cc(node, label) AS (
         |  SELECT src, src FROM sym
         |  UNION
         |  SELECT s.dst, c.label FROM cc c JOIN sym s ON s.src = c.node)
         | SELECT node, min(label) AS component FROM cc GROUP BY node"""
        .stripMargin.replaceAll("\n", " "),
    "q44_find_all_native" -> findAllSql(8192),
    "q43_hashed_tf" ->
      s"""WITH $HashedTfCtes
        | SELECT dense.doc_id, j::int AS j,
        |  coalesce(round(raw / nullif(n2, 0), 6), 0.0) AS v
        | FROM dense JOIN nrm ON dense.doc_id = nrm.doc_id"""
        .stripMargin.replaceAll("\n", " "),
    // the end-to-end pipeline over the sf-dir documents: dictionary
    // containment × the engine-emitted (alias → canonical entity) winner
    // map; obj embeds the doc_id-derived url the query synthesizes. The
    // q12 oracle pins the same triple semantics for the non-pipeline path;
    // this row pins the PIPELINE path (materialized docs/link_pairs/
    // dedup/bucketed write included).
    "q46_kg_pipeline_sf" ->
      s"""WITH dict(category, surface) AS $DictValues,
         | winners(alias, entity_id) AS $winnersValues
         | SELECT DISTINCT w.entity_id AS subj, $PredCase AS pred,
         |  'page://https://docs.example/' || d.doc_id AS obj
         | FROM documents d CROSS JOIN dict
         | JOIN winners w ON w.alias = dict.surface
         | WHERE position(surface in d.text) > 0"""
        .stripMargin.replaceAll("\n", " "),
    "q41_pagerank" -> graft.kg.PageRank.oracleSql(
      s"""WITH base AS (SELECT DISTINCT 'd:' || d.doc_id AS src, entity_id AS dst
         | FROM documents d
         |  CROSS JOIN $AliasValues AS dict(category, surface, entity_id)
         | WHERE d.doc_id % 7 = 0 AND position(surface in d.text) > 0)
         | SELECT src, dst FROM base
         | UNION SELECT dst AS src, src AS dst FROM base"""
        .stripMargin.replaceAll("\n", " "), 10),
    "q14_dedup_exact" ->
      """SELECT md5(text) AS text_md5, count(*) AS n_docs, min(doc_id) AS rep_doc_id
        | FROM documents GROUP BY 1""".stripMargin.replaceAll("\n", " "),
    "q17_text_quality" ->
      """SELECT doc_id,
        | len(string_split_regex(trim(text), '\s+'))::int AS n_tokens,
        | list_unique(string_split_regex(trim(text), '\s+'))::int AS n_distinct,
        | round(list_unique(string_split_regex(trim(text), '\s+'))::double
        |   / len(string_split_regex(trim(text), '\s+')), 4) AS ttr,
        | round(length(replace(text, ' ', ''))::double
        |   / len(string_split_regex(trim(text), '\s+')), 4) AS avg_word_len
        | FROM documents""".stripMargin.replaceAll("\n", " "),
    "q18_ann_topk" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0)
        | SELECT e.vec_id, round(list_cosine_similarity(e.embedding::DOUBLE[], q.qe), 4) AS sim
        | FROM embeddings e, q
        | ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qe) DESC, e.vec_id
        | LIMIT 10""".stripMargin.replaceAll("\n", " "),
    "q22_fingerprint" ->
      """SELECT doc_id, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp_md5
        | FROM documents""".stripMargin.replaceAll("\n", " "),
    "q28_cube" ->
      """SELECT lang, source, count(*) AS n_docs, round(avg(n_chars),4) AS avg_chars
        | FROM documents GROUP BY CUBE(lang, source)""".stripMargin.replaceAll("\n", " "),
    "q29_topk_docs" ->
      """SELECT doc_id, n_chars, lang FROM documents
        | ORDER BY n_chars DESC, doc_id ASC LIMIT 20""".stripMargin.replaceAll("\n", " "),
    "q30_union_except" ->
      """SELECT doc_id FROM (
        |  SELECT doc_id FROM documents WHERE lang = 'en'
        |  UNION SELECT doc_id FROM documents WHERE n_chars > 300)
        | EXCEPT SELECT doc_id FROM documents WHERE source = 'src0'"""
        .stripMargin.replaceAll("\n", " "),
    "q27_ner_macro" ->
      """WITH hits AS (SELECT CASE WHEN position('spark' in text) > 0
        |  OR position('hash join' in text) > 0 OR position('table scan' in text) > 0
        |  OR position('merge' in text) > 0 OR position('sort' in text) > 0
        |  OR position('customer' in text) > 0 OR position('vector' in text) > 0
        |  OR position('stream' in text) > 0 THEN 1.0 ELSE 0.0 END AS hit FROM documents)
        | SELECT round(avg(hit),4) AS macro_precision, round(avg(hit),4) AS macro_recall,
        |  round(avg(hit),4) AS macro_f1 FROM hits""".stripMargin.replaceAll("\n", " "),
    "q26_ner_batched" -> nerMentionsSql(32768),
    // language-ID: the trigram profiles materialized as a VALUES table;
    // per-doc occurrence counts per language, argmax with lang-asc
    // tie-break, 'und' when no profile trigram occurs (LEFT JOIN+coalesce)
    "q21_langid" -> langidSql(32768),
    "q23_quality" ->
      """SELECT doc_id,
        | len(string_split_regex(trim(text), '\s+'))::int AS n_tokens,
        | round(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::double
        |   / greatest(length(text), 1), 4) AS punct_ratio,
        | round(len(list_intersect(string_split_regex(trim(text), '\s+'),
        |   ['the', 'a', 'of', 'and', 'to']))::double
        |   / len(string_split_regex(trim(text), '\s+')), 4) AS stopword_hit_ratio,
        | round(length(regexp_replace(text, '\s', '', 'g'))::double
        |   / len(string_split_regex(trim(text), '\s+')), 4) AS avg_word_len
        | FROM documents""".stripMargin.replaceAll("\n", " "),
    // brute-force word-2-shingle Jaccard ≥ 0.5 via an inverted shingle
    // index (shingle-equality join counts the intersection; no O(n²)
    // all-pairs materialization) — equals the engine's LSH→verify output
    // because every true pair in this corpus sits far above the threshold
    "q31_neardup_verified" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents),
        | sh AS (SELECT doc_id, g FROM (
        |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(tk) < 2 THEN tk
        |   ELSE list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1]) END)) AS g
        |  FROM toks) WHERE g <> ''),
        | sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        | pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2)
        | SELECT da AS doc_a, db AS doc_b,
        |  round(inter::double / (sa.n + sb.n - inter), 4) AS jaccard
        | FROM pairs JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id
        | WHERE inter::double / (sa.n + sb.n - inter) >= 0.5"""
        .stripMargin.replaceAll("\n", " "),
    // md5-bucket split replay: same primitive as the engine (first 8 md5
    // hex chars of the decimal doc key, base-16 → decimal, mod 100)
    "q47_hash_split" ->
      """SELECT doc_id,
        | ('0x' || substr(md5(doc_id::varchar), 1, 8))::BIGINT % 100 AS h,
        | CASE WHEN ('0x' || substr(md5(doc_id::varchar), 1, 8))::BIGINT % 100 < 80 THEN 'train'
        |      WHEN ('0x' || substr(md5(doc_id::varchar), 1, 8))::BIGINT % 100 < 90 THEN 'val'
        |      ELSE 'test' END AS split
        | FROM documents""".stripMargin.replaceAll("\n", " "),
    "q48_repetition" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents),
        | hof AS (SELECT doc_id, CASE WHEN len(t) < 2 THEN 0.0 ELSE
        |   round(1.0 - list_unique(list_transform(range(1, len(t)),
        |     i -> t[i] || ' ' || t[i+1]))::double / (len(t) - 1), 4) END AS dup_2gram_frac
        |  FROM toks),
        | tok AS (SELECT doc_id, unnest(t) AS tok FROM toks),
        | tc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
        | top AS (SELECT doc_id, round(max(c)::double / sum(c), 4) AS top_tok_frac
        |  FROM tc GROUP BY doc_id)
        | SELECT h.doc_id, h.dup_2gram_frac, t2.top_tok_frac
        | FROM hof h JOIN top t2 USING (doc_id)""".stripMargin.replaceAll("\n", " "),
    // bucketed co-located join: the layout changes the PLAN, not the rows —
    // the oracle is the plain join over the raw parquet
    "q49_bucketed_join" ->
      """SELECT d.doc_id, d.n_chars, e.label,
        | round(sqrt(list_sum(list_transform(e.embedding,
        |   x -> x::DOUBLE * x::DOUBLE))), 4) AS emb_norm
        | FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id"""
        .stripMargin.replaceAll("\n", " "),
    "q50_partition_pruned" ->
      """SELECT source, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars
        | FROM documents WHERE lang = 'en' GROUP BY source"""
        .stripMargin.replaceAll("\n", " "),
    "q51_merge_upsert" ->
      s"""WITH dict(category, surface, entity_id) AS $AliasValues,
         | tr AS (SELECT DISTINCT entity_id AS subj, $PredCase AS pred,
         |   'doc://' || d.doc_id AS obj, d.doc_id AS did
         |  FROM documents d CROSS JOIN dict
         |  WHERE position(surface in d.text) > 0),
         | base AS (SELECT subj, pred, obj, 1::BIGINT AS rev FROM tr WHERE did % 2 = 0),
         | delta AS (SELECT subj, pred, obj, 2::BIGINT AS rev FROM tr WHERE did % 3 = 0)
         | SELECT subj, pred, obj, coalesce(d.rev, b.rev) AS rev,
         |  CASE WHEN b.rev IS NOT NULL AND d.rev IS NOT NULL THEN 'update'
         |       WHEN d.rev IS NOT NULL THEN 'insert' ELSE 'keep' END AS op
         | FROM base b FULL JOIN delta d USING (subj, pred, obj)"""
        .stripMargin.replaceAll("\n", " "),
    "q52_heavy_hitters" ->
      """WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
        | tot AS (SELECT sum(cnt) AS tot, avg(cnt) AS avg_cnt FROM c)
        | SELECT user_id, cnt, round(cnt / tot.tot, 6) AS frac,
        |  CAST(ceil(cnt / tot.avg_cnt) AS BIGINT) AS salt_factor
        | FROM c, tot ORDER BY cnt DESC, user_id LIMIT 20"""
        .stripMargin.replaceAll("\n", " "),
    // triangle count replay: identical canonicalization, degree computation,
    // (degree, id) orientation, and two-join closure as the engine
    "q53_triangles" ->
      """WITH pairs AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |   ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        | deg AS (SELECT u AS n, count(*) AS d FROM
        |  (SELECT u FROM pairs UNION ALL SELECT v FROM pairs) t(u) GROUP BY 1),
        | oriented AS (
        |  SELECT CASE WHEN (du.d, p.u) < (dv.d, p.v) THEN p.u ELSE p.v END AS a,
        |         CASE WHEN (du.d, p.u) < (dv.d, p.v) THEN p.v ELSE p.u END AS b
        |  FROM pairs p JOIN deg du ON du.n = p.u JOIN deg dv ON dv.n = p.v)
        | SELECT count(*) AS n_triangles FROM oriented e1
        |  JOIN oriented e2 ON e2.a = e1.b
        |  JOIN oriented e3 ON e3.a = e1.a AND e3.b = e2.b"""
        .stripMargin.replaceAll("\n", " "),
    "q54_tfidf" ->
      """WITH toks AS (SELECT doc_id,
        |   unnest(string_split_regex(trim(text), '\s+')) AS term FROM documents),
        | tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        | df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        | n AS (SELECT count(*) AS n FROM documents),
        | scored AS (SELECT tf.doc_id, tf.term,
        |   round(tf.tf * ln(n.n / df.df), 4) AS tfidf,
        |   row_number() OVER (PARTITION BY tf.doc_id
        |     ORDER BY tf.tf * ln(n.n / df.df) DESC, tf.term) AS rn
        |  FROM tf JOIN df USING (term) CROSS JOIN n)
        | SELECT doc_id, term, tfidf FROM scored WHERE rn <= 3"""
        .stripMargin.replaceAll("\n", " "),
    "q55_quantiles" ->
      """SELECT lang, round(quantile_cont(n_chars, 0.5), 4) AS p50,
        | round(quantile_cont(n_chars, 0.9), 4) AS p90,
        | round(quantile_cont(n_chars, 0.99), 4) AS p99
        | FROM documents GROUP BY lang""".stripMargin.replaceAll("\n", " "),
    // decontamination replay: same md5 split bucket, same distinct word
    // 13-grams, same 48-bit md5 gram fingerprint, same train-side df cap
    // (10000 — a no-op on the fixture, replayed anyway so the gate checks
    // the FULL semantics), same ≥3 threshold
    "q56_decontamination" ->
      """WITH split AS (SELECT doc_id, text,
        |   ('0x' || substr(md5(doc_id::varchar), 1, 8))::BIGINT % 100 AS h
        |  FROM documents),
        | toks AS (SELECT doc_id, h, string_split_regex(trim(text), '\s+') AS t
        |  FROM split),
        | sh AS (SELECT doc_id, h, unnest(list_distinct(list_transform(
        |   range(1, len(t) - 11),
        |   i -> list_aggregate(t[i:i+12], 'string_agg', ' ')))) AS g
        |  FROM toks WHERE len(t) >= 13),
        | fp AS (SELECT doc_id, h, ('0x' || substr(md5(g), 1, 12))::BIGINT AS gh
        |  FROM sh),
        | tdf AS (SELECT gh, count(*) AS tdf FROM fp WHERE h < 80 GROUP BY 1),
        | hits AS (SELECT e.doc_id AS eval_doc, tr.doc_id AS train_doc,
        |   count(*) AS n_shared
        |  FROM fp e JOIN fp tr ON e.gh = tr.gh JOIN tdf ON tdf.gh = e.gh
        |  WHERE e.h >= 80 AND tr.h < 80 AND tdf.tdf <= 10000 GROUP BY 1, 2)
        | SELECT eval_doc, train_doc, n_shared FROM hits WHERE n_shared >= 3"""
        .stripMargin.replaceAll("\n", " "),
    "q57_stratified_sample" ->
      """SELECT doc_id, lang,
        | ('0x' || substr(md5(doc_id::varchar), 1, 8))::BIGINT % 100 AS h
        | FROM documents
        | WHERE ('0x' || substr(md5(doc_id::varchar), 1, 8))::BIGINT % 100 <
        |  CASE WHEN lang = 'en' THEN 50 WHEN lang = 'de' THEN 25 ELSE 10 END"""
        .stripMargin.replaceAll("\n", " "),
    // BFS replay: same co-occurrence graph, recursive CTE with UNION
    // (per-iteration dedup keeps walks from exploding), min dist per node
    "q60_khop_bfs" ->
      """WITH RECURSIVE pairs AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |   ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        | edges AS (SELECT u, v FROM pairs
        |  UNION ALL SELECT v AS u, u AS v FROM pairs),
        | seed AS (SELECT min(u) AS s FROM pairs),
        | bfs(node, dist) AS (
        |   SELECT s, 0::BIGINT FROM seed
        |   UNION
        |   SELECT e.v, b.dist + 1 FROM bfs b JOIN edges e ON e.u = b.node
        |   WHERE b.dist < 3)
        | SELECT node, min(dist) AS dist FROM bfs GROUP BY node"""
        .stripMargin.replaceAll("\n", " "),
    // the JSONL round-trip is lossless iff every row reads text_ok=true —
    // the oracle simply asserts that shape from the source table
    "q59_jsonl_roundtrip" ->
      """SELECT doc_id, true AS text_ok, n_chars FROM documents"""
        .stripMargin.replaceAll("\n", " "),
    // BRAT corpus statistics / gold-category counts over the real reference
    // corpora — DuckDB re-parses the same .txt/.ann files via read_text
    "q33_brat_stats" ->
      s"""SELECT dataset, count(*) AS n_docs,
         | round(avg(n_chars), 4) AS avg_text_length,
         | round(stddev_pop(n_chars), 4) AS std_text_length,
         | round(avg(n_entities), 4) AS avg_entities,
         | round(stddev_pop(n_entities), 4) AS std_entities
         | FROM $bratDocsSql d GROUP BY dataset""".stripMargin.replaceAll("\n", " "),
    "q34_brat_gold" ->
      s"""SELECT dataset, category, count(*) AS n_mentions
         | FROM (SELECT dataset, unnest(cats) AS category FROM $bratDocsSql d)
         | GROUP BY 1, 2""".stripMargin.replaceAll("\n", " "),
    "q35_tsv_gold" ->
      """SELECT filename, label, start_span::int AS start_span,
        | end_span::int AS end_span, text
        | FROM read_csv('/root/reference/datasets/multicardioner-track2/en/tsv/multicardioner_track2_cardioccc_test_en.tsv',
        |  delim='\t', header=true, all_varchar=true)""".stripMargin.replaceAll("\n", " "),
    // pseudo-frame sampling: ceil(bytes/64) frames, every 2nd kept; the
    // last frame carries the remainder bytes
    "q25_frame_sample" -> frameSampleSql(4096),
    // LSH semantics replayed in SQL: the hyperplanes are the engine's own
    // doubles (planesValues), bucket = sign-bit sum, multi-probe = Hamming
    // distance ≤ 1 on the bucket id — pins bucketing, probing, AND the
    // cosine top-k in one row
    "q19_ann_lsh" -> (
      s"""WITH planes(pid, w) AS ${planesValues(64, 8)},
        | b AS (SELECT e.vec_id,
        |    sum(CASE WHEN list_dot_product(e.embedding::DOUBLE[], p.w) > 0
        |             THEN (1 << p.pid) ELSE 0 END)::int AS bucket
        |   FROM embeddings e CROSS JOIN planes p GROUP BY e.vec_id),
        | v AS (SELECT b.vec_id, b.bucket, e.embedding
        |   FROM b JOIN embeddings e USING (vec_id)),
        | q AS (SELECT embedding AS qe, bucket AS qb FROM v WHERE vec_id = 0)
        | SELECT vec_id, round(sim, 4) AS sim FROM (
        |  SELECT v.vec_id,
        |   list_cosine_similarity(v.embedding::DOUBLE[], q.qe::DOUBLE[]) AS sim
        |  FROM v CROSS JOIN q WHERE bit_count(xor(v.bucket, q.qb)) <= 1
        |  ORDER BY sim DESC, v.vec_id ASC LIMIT 10) t"""
        .stripMargin.replaceAll("\n", " ")),
    "q32_embedding_neardup" -> (
      s"""WITH planes(pid, w) AS ${planesValues(64, 4)},
        | b AS (SELECT e.vec_id,
        |    sum(CASE WHEN list_dot_product(e.embedding::DOUBLE[], p.w) > 0
        |             THEN (1 << p.pid) ELSE 0 END)::int AS bucket
        |   FROM embeddings e CROSS JOIN planes p GROUP BY e.vec_id),
        | v AS (SELECT b.vec_id, b.bucket, e.embedding
        |   FROM b JOIN embeddings e USING (vec_id))
        | SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
        |  round(list_cosine_similarity(a.embedding::DOUBLE[],
        |                               c.embedding::DOUBLE[]), 4) AS sim
        | FROM v a JOIN v c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
        | WHERE list_cosine_similarity(a.embedding::DOUBLE[],
        |                              c.embedding::DOUBLE[]) >= 0.3"""
        .stripMargin.replaceAll("\n", " ")),
    // the closed forms mirror graft.fixtures.MediaGen exactly; matching
    // values prove the engine's REAL ImageIO encode→decode→resize→decode
    // round-trip (not a metadata echo — dims/means are read back from
    // decoded rasters)
    "q24_media_features" ->
      """WITH d AS (SELECT doc_id,
        |   (16 + (doc_id % 8) * 16)::double AS w,
        |   (16 + ((doc_id // 8) % 8) * 16)::double AS h FROM documents)
        | SELECT doc_id AS id, w::int AS width, h::int AS height,
        |  3::int AS channels,
        |  (CASE WHEN greatest(w,h) <= 48 THEN w
        |        ELSE ceil(w * (48.0 / greatest(w,h))) END)::int AS out_width,
        |  (CASE WHEN greatest(w,h) <= 48 THEN h
        |        ELSE ceil(h * (48.0 / greatest(w,h))) END)::int AS out_height,
        |  ((doc_id * 37) % 256)::double AS mean_r,
        |  ((doc_id * 73) % 256)::double AS mean_g,
        |  ((doc_id * 101) % 256)::double AS mean_b
        | FROM d""".stripMargin.replaceAll("\n", " "),
    // full MinHash-LSH replay: word 2-shingles, 64 universal hashes over
    // the md5-32 primitive (coefficients emitted from the engine's PRNG),
    // 16 bands × 4 rows, in-bucket pairing, signature-agreement estimate
    "q15_minhash_pairs" -> minhashSql(4096),
    "q61_neardup_clusters" -> clustersSql(4096),
    "q62_line_dedup" -> lineDedupSql(4096),
    "q63_line_dedup_strip" -> lineStripSql(4096),
    "q64_delta_dedup" -> deltaSql(4096),
    "q65_pii_scrub" -> piiSql,
    // shares the sc scoring CTEs with the q95 oracle (one definition —
    // see LmScore.ScoreCtes)
    "q66_unigram_logprob" ->
      s"""WITH ${graft.quality.LmScore.ScoreCtes}
         | SELECT doc_id, n_tokens, lp AS avg_logprob FROM sc"""
        .stripMargin.replaceAll("\n", " "),
    "q67_sequence_pack" ->
      """WITH n AS (SELECT doc_id,
        |  len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS n_tokens
        |  FROM documents),
        | o AS (SELECT doc_id, n_tokens,
        |   (sum(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    - n_tokens) AS start_offset FROM n)
        | SELECT doc_id, n_tokens::bigint AS n_tokens,
        |  start_offset::bigint AS start_offset,
        |  (start_offset // 4096)::bigint AS pack_id
        | FROM o""".stripMargin.replaceAll("\n", " "),
    "q68_domain_stats" ->
      """WITH u AS (SELECT doc_id,
        |  'https://' || CASE WHEN doc_id % 4 = 0 THEN 'www.' ELSE '' END
        |   || 'pages.' || source || '.org/page/' || doc_id AS url, n_chars
        |  FROM documents),
        | h AS (SELECT doc_id, regexp_extract(url, '^[a-z]+://([^/]+)/', 1) AS host,
        |   n_chars FROM u),
        | d AS (SELECT doc_id, regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS domain,
        |   n_chars FROM h)
        | SELECT domain, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars,
        |  round(count(*) / (SELECT count(*) FROM documents), 4) AS doc_share
        | FROM d GROUP BY domain""".stripMargin.replaceAll("\n", " "),
    "q69_entity_pmi" ->
      s"""WITH dict(category, surface, entity_id) AS $AliasValues,
         | ent AS (SELECT DISTINCT d.doc_id, entity_id FROM documents d CROSS JOIN dict
         |   WHERE position(surface in d.text) > 0),
         | c AS (SELECT entity_id, count(*)::double AS cnt FROM ent GROUP BY 1),
         | p AS (SELECT a.entity_id AS e1, b.entity_id AS e2, count(*) AS n_pair
         |   FROM ent a JOIN ent b ON a.doc_id = b.doc_id AND a.entity_id < b.entity_id
         |   GROUP BY 1, 2)
         | SELECT p.e1, p.e2, p.n_pair,
         |  round(ln(p.n_pair * (SELECT count(*)::double FROM documents)
         |    / (c1.cnt * c2.cnt)), 4) AS pmi
         | FROM p JOIN c c1 ON p.e1 = c1.entity_id
         | JOIN c c2 ON p.e2 = c2.entity_id""".stripMargin.replaceAll("\n", " "),
    // replays the synthesis AND the full canonicalization ladder (fragment,
    // case, default port, www, utm params, trailing slash)
    "q70_url_canonical" ->
      """WITH u AS (SELECT doc_id,
        |   'pages.s' || ((doc_id // 4) % 5) || '.org' AS h0,
        |   '/p/' || (doc_id // 4) AS pth FROM documents),
        | raw AS (SELECT doc_id, CASE doc_id % 4
        |   WHEN 0 THEN 'https://' || h0 || pth || '?utm_source=feed'
        |   WHEN 1 THEN 'HTTPS://' || upper(h0) || pth
        |   WHEN 2 THEN 'https://www.' || h0 || ':443' || pth || '#sec'
        |   ELSE 'https://' || h0 || pth || '/' END AS url FROM u),
        | s1 AS (SELECT doc_id, regexp_replace(url, '#.*', '') AS nf FROM raw),
        | s2 AS (SELECT doc_id,
        |   lower(regexp_extract(nf, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |   lower(regexp_extract(nf, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS hp,
        |   regexp_extract(nf, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(.*)', 1) AS r0
        |  FROM s1),
        | s3 AS (SELECT doc_id, scheme,
        |   regexp_replace(CASE WHEN scheme = 'https' THEN regexp_replace(hp, ':443$', '')
        |     WHEN scheme = 'http' THEN regexp_replace(hp, ':80$', '') ELSE hp END,
        |     '^www\.', '') AS host, r0
        |  FROM s2),
        | s4 AS (SELECT doc_id, scheme, host,
        |   CASE WHEN position('?' IN r0) > 0
        |     THEN substr(r0, 1, position('?' IN r0) - 1) ELSE r0 END AS pth,
        |   CASE WHEN position('?' IN r0) > 0 THEN array_to_string(
        |     list_filter(string_split(substr(r0, position('?' IN r0) + 1), '&'),
        |       p -> NOT starts_with(p, 'utm_')), '&') ELSE '' END AS q
        |  FROM s3)
        | SELECT scheme || '://' || host ||
        |   rtrim(CASE WHEN q != '' THEN pth || '?' || q ELSE pth END, '/')
        |   AS canon_url,
        |  count(*) AS n_docs, min(doc_id) AS min_doc_id
        | FROM s4 GROUP BY 1""".stripMargin.replaceAll("\n", " "),
    "q71_inverted_index" ->
      """WITH toks AS (SELECT DISTINCT doc_id, tok FROM
        |   (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
        |    FROM documents)),
        | d AS (SELECT tok, count(*) AS df FROM toks GROUP BY tok)
        | SELECT t.tok, d.df,
        |  array_to_string(list_transform(list_sort(list(t.doc_id)), x -> x::VARCHAR),
        |    ',') AS postings
        | FROM toks t JOIN d USING (tok)
        | WHERE d.df <= (SELECT max(df) FROM
        |   (SELECT DISTINCT df FROM d ORDER BY df LIMIT 8))
        | GROUP BY t.tok, d.df""".stripMargin.replaceAll("\n", " "),
    "q72_quality_classifier" ->
      s"""WITH $HashedTfCtes,
         | cells AS (SELECT dense.doc_id, j::int AS j,
         |   coalesce(round(raw / nullif(n2, 0), 6), 0.0) AS v
         |  FROM dense JOIN nrm ON dense.doc_id = nrm.doc_id)
         | SELECT doc_id, round(1 / (1 + exp(-raw)), 4) AS quality,
         |  raw >= 0 AS keep
         | FROM (SELECT doc_id, sum(v * (((j % 7) - 3) / 3.0)) AS raw
         |       FROM cells GROUP BY doc_id)""".stripMargin.replaceAll("\n", " "),
    // static fallback: 12 unrolled peel rounds (sf0.01 fixpoints in 6);
    // oracleSqlFor replaces this with the engine-measured round count
    "q73_kcore" -> graft.kg.KCore.oracleSql(KCoreEdgesSql, KCoreK, 12),
    "q74_kg_negatives" ->
      s"""WITH dict(category, surface, entity_id) AS $AliasValues,
         | tr AS (SELECT DISTINCT entity_id AS subj, $PredCase AS pred,
         |   'doc://' || d.doc_id AS obj
         |  FROM documents d CROSS JOIN dict WHERE position(surface in d.text) > 0),
         | vocab AS (SELECT subj AS ent,
         |   (row_number() OVER (ORDER BY subj)) - 1 AS idx
         |  FROM (SELECT DISTINCT subj FROM tr)),
         | v AS (SELECT count(*) AS n FROM vocab)
         | SELECT t.subj, t.pred, t.obj, v2.ent AS neg_subj
         | FROM tr t JOIN vocab v1 ON t.subj = v1.ent CROSS JOIN v
         | JOIN vocab v2 ON v2.idx = (v1.idx
         |   + (('0x' || substr(md5(t.subj || '|' || t.pred || '|' || t.obj), 1, 8))::BIGINT
         |      % (v.n - 1)) + 1) % v.n""".stripMargin.replaceAll("\n", " "),
    // wedge-enumeration replay of q75: centers capped at the same hub
    // degree (static fallback cap; oracleSqlFor inlines the measured p75),
    // Adamic-Adar weight 1/ln(center degree), degrees for Jaccard from
    // the FULL graph
    "q75_link_predict" -> linkPredSql(LinkPredHubCapStatic),
    // ascending-id triangle join (fine at oracle scale) + corner charge
    "q88_clustering_coeff" ->
      graft.kg.ClusteringCoeff.oracleSql(KCoreEdgesSql),
    // the engine's synchronous rounds unrolled (PageRank's oracle pattern)
    "q89_label_prop" ->
      graft.kg.LabelProp.oracleSql(KCoreEdgesSql, LabelPropRounds),
    // static token bound; oracleSqlFor derives it from the table maxima
    "q90_bigram_logprob" -> bigramSql(4096),
    "q91_heaps_law" -> graft.quality.VocabGrowth.oracleSql,
    // seed-teleport PageRank unroll: both edge directions of the canonical
    // list, seed = the graph's min node
    "q92_personalized_pagerank" -> graft.kg.PageRank.personalizedOracleSql(
      s"""WITH ed AS ($KCoreEdgesSql)
         | SELECT u AS src, v AS dst FROM ed
         | UNION ALL SELECT v AS src, u AS dst FROM ed"""
        .stripMargin.replaceAll("\n", " "),
      "SELECT min(src) AS node FROM edges", PprIters),
    // VoID-profile replay over the q12 triple synthesis
    "q93_pred_cardinality" ->
      s"""WITH dict(category, surface, entity_id) AS $AliasValues,
         | tr AS (SELECT DISTINCT entity_id AS subj, $PredCase AS pred,
         |   'doc://' || d.doc_id AS obj
         |  FROM documents d CROSS JOIN dict
         |  WHERE position(surface in d.text) > 0)
         | SELECT pred, count(*) AS n_triples,
         |  count(DISTINCT subj) AS n_subj, count(DISTINCT obj) AS n_obj,
         |  round(count(*) / count(DISTINCT subj), 4) AS avg_fanout
         | FROM tr GROUP BY pred""".stripMargin.replaceAll("\n", " "),
    "q94_assortativity" -> graft.kg.Assortativity.oracleSql(KCoreEdgesSql),
    // static fallback (DuckDB-side quantile_cont); oracleSqlFor inlines
    // the ENGINE-measured cutpoints — cross-engine percentile parity is
    // not bit-exact (see LmScore.scoreCutpoints)
    "q95_perplexity_buckets" -> graft.quality.LmScore.bucketsOracleSqlStatic(10),
    "q96_community_rollup" ->
      graft.kg.LabelProp.rollupOracleSql(KCoreEdgesSql, LabelPropRounds),
    // FULL-graph CC replay (q13's reachability recursion): the incremental
    // result must be indistinguishable from a batch recompute
    "q97_incremental_cc" ->
      s"""WITH RECURSIVE edges AS ($KCoreEdgesSql),
         | sym AS (SELECT u AS src, v AS dst FROM edges
         |   UNION SELECT v AS src, u AS dst FROM edges),
         | cc(node, label) AS (
         |  SELECT src, src FROM sym
         |  UNION
         |  SELECT s.dst, c.label FROM cc c JOIN sym s ON s.src = c.node)
         | SELECT node, min(label) AS component FROM cc GROUP BY node"""
        .stripMargin.replaceAll("\n", " "),
    "q98_degree_histogram" ->
      graft.kg.Assortativity.histogramOracleSql(KCoreEdgesSql),
    "q99_containment" ->
      Dedup.containmentOracleSql(ContainDfPct, ContainMinOverlap),
    // q12's triple CTE + q80's closure CTE + the declared domains: keep
    // (subj, pred) groups whose subject type set lacks the declaration
    "q100_domain_violations" ->
      s"""WITH RECURSIVE dict(category, surface, entity_id) AS $AliasValues,
         | sub(c, p) AS $ClassHierarchyValues,
         | cl(c, p) AS (SELECT c, p FROM sub
         |   UNION SELECT cl.c, sub.p FROM cl JOIN sub ON cl.p = sub.c),
         | ent AS (SELECT DISTINCT entity_id, category FROM documents d
         |   CROSS JOIN dict WHERE position(surface in d.text) > 0),
         | typ AS (SELECT DISTINCT entity_id, type FROM (
         |  SELECT entity_id, category AS type FROM ent
         |  UNION ALL
         |  SELECT ent.entity_id, cl.p AS type FROM ent
         |  JOIN cl ON ent.category = cl.c)),
         | tr AS (SELECT DISTINCT entity_id AS subj, $PredCase AS pred,
         |   'doc://' || d.doc_id AS obj
         |  FROM documents d CROSS JOIN dict WHERE position(surface in d.text) > 0),
         | grp AS (SELECT subj, pred, count(*) AS n_triples
         |   FROM tr GROUP BY 1, 2),
         | dom(pred, required_type) AS $PredDomainsValues
         | SELECT g.subj, g.pred, dom.required_type, g.n_triples
         | FROM grp g JOIN dom ON dom.pred = g.pred
         | LEFT JOIN typ ON typ.entity_id = g.subj
         |   AND typ.type = dom.required_type
         | WHERE typ.entity_id IS NULL""".stripMargin.replaceAll("\n", " "),
    // q82's doc_id%3 snapshot split + the shared PredAliasCase rename on
    // side B; alignment = per-pair (subj,obj) overlap with per-predicate
    // totals (counts are over DISTINCT triples on each side)
    "q101_pred_alignment" ->
      s"""WITH dict(category, surface, entity_id) AS $AliasValues,
         | tr AS (SELECT DISTINCT entity_id AS subj, $PredCase AS pred,
         |   'doc://' || d.doc_id AS obj, d.doc_id AS did
         |  FROM documents d CROSS JOIN dict WHERE position(surface in d.text) > 0),
         | a AS (SELECT DISTINCT subj, pred, obj FROM tr WHERE did % 3 != 0),
         | b AS (SELECT DISTINCT subj, $PredAliasCase AS pred, obj
         |   FROM tr WHERE did % 3 != 1),
         | na AS (SELECT pred AS pred_a, count(*) AS n_a FROM a GROUP BY 1),
         | nb AS (SELECT pred AS pred_b, count(*) AS n_b FROM b GROUP BY 1),
         | nboth AS (SELECT a.pred AS pred_a, b.pred AS pred_b,
         |   count(*) AS n_both
         |  FROM a JOIN b ON a.subj = b.subj AND a.obj = b.obj GROUP BY 1, 2)
         | SELECT pred_a, pred_b, n_a, n_b, n_both,
         |  round(n_both / (n_a + n_b - n_both), 4) AS jaccard
         | FROM nboth JOIN na USING (pred_a) JOIN nb USING (pred_b)"""
        .stripMargin.replaceAll("\n", " "),
    // the three corrupted sources replayed via a fixed-bound series;
    // count(DISTINCT source) == the engine's distinct-then-count;
    // window sum cast to BIGINT (DuckDB sums to HUGEINT)
    "q102_fact_fusion" ->
      s"""WITH src AS (
         |  SELECT 's_' || s_suppkey AS subj, 'in_nation' AS pred,
         |   'n_' || (CASE WHEN (s_suppkey + g.k) % $FusionCorruptMod = 0
         |     THEN (s_nationkey + 1 + g.k) % 25
         |     ELSE s_nationkey END) AS obj,
         |   g.k AS source
         |  FROM supplier CROSS JOIN generate_series(0, ${FusionSources - 1}) g(k)),
         | votes AS (SELECT subj, pred, obj,
         |   count(DISTINCT source) AS n_votes FROM src GROUP BY 1, 2, 3),
         | ranked AS (SELECT subj, pred, obj, n_votes,
         |   (sum(n_votes) OVER (PARTITION BY subj, pred))::bigint AS n_claims,
         |   row_number() OVER (PARTITION BY subj, pred
         |     ORDER BY n_votes DESC, obj ASC) AS rn
         |  FROM votes)
         | SELECT subj, pred, obj, n_votes, n_claims,
         |  n_votes = n_claims AS unanimous
         | FROM ranked WHERE rn = 1""".stripMargin.replaceAll("\n", " "),
    // q103: the q101 triple derivation, two salted md5 captures (the
    // documented Buckets replay form), then pure per-predicate arithmetic
    // — Chapman is (n_a+1)(n_b+1)/(n_both+1)−1 in BOTH engines with the
    // same operation order, and Petersen NULLs out on empty overlap
    "q103_recall_estimate" ->
      s"""WITH dict(category, surface, entity_id) AS $AliasValues,
         | tr AS (SELECT DISTINCT entity_id AS subj, $PredCase AS pred,
         |   'doc://' || d.doc_id AS obj
         |  FROM documents d CROSS JOIN dict WHERE position(surface in d.text) > 0),
         | a AS (SELECT subj, pred, obj FROM tr
         |  WHERE ('0x' || substr(md5('cra|' || subj || '|' || pred || '|' || obj),
         |    1, 8))::BIGINT % 10 < 7),
         | b AS (SELECT subj, pred, obj FROM tr
         |  WHERE ('0x' || substr(md5('crb|' || subj || '|' || pred || '|' || obj),
         |    1, 8))::BIGINT % 10 < 7),
         | na AS (SELECT pred, count(*) AS n_a FROM a GROUP BY 1),
         | nb AS (SELECT pred, count(*) AS n_b FROM b GROUP BY 1),
         | nboth AS (SELECT pred, count(*) AS n_both
         |  FROM a JOIN b USING (subj, pred, obj) GROUP BY 1),
         | ov AS (SELECT pred, n_a, n_b, coalesce(n_both, 0) AS n_both
         |  FROM na JOIN nb USING (pred) LEFT JOIN nboth USING (pred))
         | SELECT pred, n_a, n_b, n_both,
         |  round(n_a * n_b / nullif(n_both, 0), 4) AS est_petersen,
         |  round((n_a + 1) * (n_b + 1) / (n_both + 1) - 1, 4) AS est_chapman,
         |  round(n_a / ((n_a + 1) * (n_b + 1) / (n_both + 1) - 1), 4) AS recall_a,
         |  round(n_b / ((n_a + 1) * (n_b + 1) / (n_both + 1) - 1), 4) AS recall_b
         | FROM ov""".stripMargin.replaceAll("\n", " "),
    // q105: q101's alignment CTEs → threshold + best-canon-per-pred_b →
    // rename B through the map (LEFT join — unaligned B predicates keep
    // their name) → distinct union with per-side provenance flags
    "q105_kg_merge" ->
      s"""WITH dict(category, surface, entity_id) AS $AliasValues,
         | tr AS (SELECT DISTINCT entity_id AS subj, $PredCase AS pred,
         |   'doc://' || d.doc_id AS obj, d.doc_id AS did
         |  FROM documents d CROSS JOIN dict WHERE position(surface in d.text) > 0),
         | a AS (SELECT DISTINCT subj, pred, obj FROM tr WHERE did % 3 != 0),
         | b AS (SELECT DISTINCT subj, $PredAliasCase AS pred, obj
         |   FROM tr WHERE did % 3 != 1),
         | na AS (SELECT pred AS pred_a, count(*) AS n_a FROM a GROUP BY 1),
         | nb AS (SELECT pred AS pred_b, count(*) AS n_b FROM b GROUP BY 1),
         | nboth AS (SELECT a.pred AS pred_a, b.pred AS pred_b,
         |   count(*) AS n_both
         |  FROM a JOIN b ON a.subj = b.subj AND a.obj = b.obj GROUP BY 1, 2),
         | al AS (SELECT pred_a, pred_b,
         |   round(n_both / (n_a + n_b - n_both), 4) AS jaccard
         |  FROM nboth JOIN na USING (pred_a) JOIN nb USING (pred_b)),
         | ren AS (SELECT pred_b, pred_a AS canon FROM (
         |   SELECT pred_a, pred_b, row_number() OVER (PARTITION BY pred_b
         |     ORDER BY jaccard DESC, pred_a ASC) AS rn
         |   FROM al WHERE jaccard >= $MergeMinJaccard) t WHERE rn = 1),
         | u AS (SELECT subj, pred, obj, 'a' AS side FROM a
         |  UNION ALL
         |  SELECT b.subj, coalesce(ren.canon, b.pred) AS pred, b.obj,
         |   'b' AS side
         |  FROM b LEFT JOIN ren ON ren.pred_b = b.pred)
         | SELECT subj, pred, obj,
         |  max(CASE WHEN side = 'a' THEN 1 ELSE 0 END) = 1 AS in_a,
         |  max(CASE WHEN side = 'b' THEN 1 ELSE 0 END) = 1 AS in_b
         | FROM u GROUP BY 1, 2, 3""".stripMargin.replaceAll("\n", " "),
    // q106: UNION (set semantics) adds the reversed inv_ facts for even
    // docs, then the self-join keys x's fact against y's REVERSED fact;
    // MATERIALIZED stops DuckDB re-evaluating u per reference
    "q106_inverse_preds" ->
      s"""WITH dict(category, surface, entity_id) AS $AliasValues,
         | tr AS MATERIALIZED (SELECT DISTINCT entity_id AS subj,
         |   $PredCase AS pred, 'doc://' || d.doc_id AS obj, d.doc_id AS did
         |  FROM documents d CROSS JOIN dict WHERE position(surface in d.text) > 0),
         | u AS MATERIALIZED (SELECT subj, pred, obj FROM tr
         |  UNION
         |  SELECT obj AS subj, 'inv_' || pred AS pred, subj AS obj
         |  FROM tr WHERE did % 2 = 0),
         | na AS (SELECT pred AS pred_a, count(*) AS n_a FROM u GROUP BY 1),
         | nb AS (SELECT pred AS pred_b, count(*) AS n_b FROM u GROUP BY 1),
         | nboth AS (SELECT x.pred AS pred_a, y.pred AS pred_b,
         |   count(*) AS n_both
         |  FROM u x JOIN u y ON x.subj = y.obj AND x.obj = y.subj
         |  GROUP BY 1, 2)
         | SELECT pred_a, pred_b, n_a, n_b, n_both,
         |  round(n_both / (n_a + n_b - n_both), 4) AS jaccard
         | FROM nboth JOIN na USING (pred_a) JOIN nb USING (pred_b)"""
        .stripMargin.replaceAll("\n", " "),
    // q107: doc-level surface presence (the q100 equivalence) split by
    // the reduced dictionary into unlinked mentions vs linked entities;
    // confidence is one exact integer division rounded to 4 decimals
    "q107_alias_mining" ->
      s"""WITH dict(category, surface) AS $DictValues,
         | red(alias, entity_id) AS $ReducedAliasValues,
         | men AS MATERIALIZED (SELECT DISTINCT d.doc_id, v.surface
         |  FROM documents d CROSS JOIN dict v
         |  WHERE position(v.surface in d.text) > 0),
         | unl AS MATERIALIZED (SELECT m.doc_id, m.surface FROM men m
         |  LEFT JOIN red r ON m.surface = r.alias WHERE r.alias IS NULL),
         | lnk AS MATERIALIZED (SELECT DISTINCT m.doc_id, r.entity_id
         |  FROM men m JOIN red r ON m.surface = r.alias),
         | ns AS (SELECT surface, count(*) AS n_docs_surface FROM unl GROUP BY 1),
         | nb AS (SELECT u.surface, l.entity_id, count(*) AS n_docs_both
         |  FROM unl u JOIN lnk l ON u.doc_id = l.doc_id GROUP BY 1, 2)
         | SELECT nb.surface, nb.entity_id, nb.n_docs_both,
         |  ns.n_docs_surface,
         |  round(nb.n_docs_both / ns.n_docs_surface, 4) AS confidence
         | FROM nb JOIN ns ON nb.surface = ns.surface
         | WHERE nb.n_docs_both >= $MineMinSupport
         |  AND round(nb.n_docs_both / ns.n_docs_surface, 4) >= $MineMinConf"""
        .stripMargin.replaceAll("\n", " "),
    // q123: typed entities × their type's shapes LEFT-join the distinct
    // (subj, pred) object counts, so absent facts check as n_obj = 0;
    // facts = doc-grounded triples + cooccurs_with (the q109 usage union)
    "q123_shape_violations" ->
      s"""WITH dict(category, surface, entity_id) AS $AliasValues,
         | shp(subj_type, pred, min_count, max_count) AS $ShapeValues,
         | men AS MATERIALIZED (SELECT DISTINCT d.doc_id, dict.category,
         |   dict.entity_id FROM documents d CROSS JOIN dict
         |  WHERE position(surface in d.text) > 0),
         | tr AS (SELECT DISTINCT entity_id AS subj, $PredCase AS pred,
         |   'doc://' || doc_id AS obj FROM men
         |  UNION
         |  SELECT DISTINCT a.entity_id, 'cooccurs_with', b.entity_id
         |  FROM men a JOIN men b ON a.doc_id = b.doc_id
         |   AND a.entity_id <> b.entity_id),
         | cnt AS (SELECT subj, pred, count(*) AS n_obj FROM tr GROUP BY 1, 2),
         | ty AS (SELECT DISTINCT entity_id AS subj, category AS subj_type
         |  FROM men)
         | SELECT ty.subj, ty.subj_type, shp.pred,
         |  coalesce(cnt.n_obj, 0)::BIGINT AS n_obj,
         |  shp.min_count, shp.max_count,
         |  CASE WHEN coalesce(cnt.n_obj, 0) < shp.min_count THEN 'min'
         |   ELSE 'max' END AS kind
         | FROM ty JOIN shp ON shp.subj_type = ty.subj_type
         | LEFT JOIN cnt ON cnt.subj = ty.subj AND cnt.pred = shp.pred
         | WHERE coalesce(cnt.n_obj, 0) < shp.min_count
         |  OR coalesce(cnt.n_obj, 0) > shp.max_count"""
        .stripMargin.replaceAll("\n", " "),
    // q124: q107's evidence CTEs aggregated per surface — entropy folds
    // as ln(T) - sum(n*ln(n))/T over the per-entity doc counts, rounded
    // to 4 like every cross-engine transcendental (q66/q90 discipline)
    "q124_alias_ambiguity" ->
      s"""WITH dict(category, surface) AS $DictValues,
         | red(alias, entity_id) AS $ReducedAliasValues,
         | men AS MATERIALIZED (SELECT DISTINCT d.doc_id, v.surface
         |  FROM documents d CROSS JOIN dict v
         |  WHERE position(v.surface in d.text) > 0),
         | unl AS MATERIALIZED (SELECT m.doc_id, m.surface FROM men m
         |  LEFT JOIN red r ON m.surface = r.alias WHERE r.alias IS NULL),
         | lnk AS MATERIALIZED (SELECT DISTINCT m.doc_id, r.entity_id
         |  FROM men m JOIN red r ON m.surface = r.alias),
         | nb AS (SELECT u.surface, l.entity_id, count(*) AS n
         |  FROM unl u JOIN lnk l ON u.doc_id = l.doc_id GROUP BY 1, 2)
         | SELECT surface, count(*)::BIGINT AS n_entities,
         |  CAST(sum(n) AS BIGINT) AS n_docs_total,
         |  round(max(n) / sum(n), 4) AS top_share,
         |  round(ln(CAST(sum(n) AS DOUBLE))
         |    - sum(n * ln(n)) / sum(n), 4) AS entropy
         | FROM nb GROUP BY 1""".stripMargin.replaceAll("\n", " "),
    // q125: the q79 candidate replay + the twin gold, folded to the
    // Christen blocking triple; C(n,2) anchors the reduction ratio
    "q125_er_blocking_eval" ->
      s"""WITH recs AS (
         |  SELECT c_custkey * 2 AS rec_id, c_name AS key FROM customer
         |  UNION ALL
         |  SELECT c_custkey * 2 + 1 AS rec_id,
         |   CASE WHEN c_custkey % 2 = 0 THEN c_name || ' '
         |        ELSE c_name || right(c_name, 1) END AS key FROM customer),
         | rnk AS (SELECT rec_id, key,
         |   row_number() OVER (ORDER BY key, rec_id) AS rnk FROM recs),
         | cand AS (SELECT DISTINCT least(a.rec_id, b.rec_id) AS id_a,
         |   greatest(a.rec_id, b.rec_id) AS id_b
         |  FROM rnk a CROSS JOIN generate_series(1, $ErWindow) g(j)
         |  JOIN rnk b ON b.rnk = a.rnk + g.j
         |  WHERE levenshtein(a.key, b.key) <= $ErMaxDist),
         | gold AS (SELECT c_custkey * 2 AS id_a, c_custkey * 2 + 1 AS id_b
         |  FROM customer),
         | m AS (SELECT
         |   (SELECT count(*) FROM recs) AS n_records,
         |   (SELECT count(*) FROM cand) AS n_candidates,
         |   (SELECT count(*) FROM gold) AS n_gold,
         |   (SELECT count(*) FROM cand JOIN gold USING (id_a, id_b))
         |     AS n_tp)
         | SELECT n_records, n_candidates, n_gold, n_tp,
         |  round(n_tp / n_gold, 4) AS pairs_completeness,
         |  round(n_tp / n_candidates, 4) AS pairs_quality,
         |  round(1 - n_candidates /
         |    (n_records * (n_records - 1) / 2.0), 4) AS reduction_ratio
         | FROM m""".stripMargin.replaceAll("\n", " "),
    // q127: the 3-pattern provenance BGP with the VALUES IN-list, the
    // var-var and the var-const FILTER replayed as plain predicates;
    // string comparison is codepoint order in both engines
    "q127_bgp_filter_values" ->
      s"""WITH dict(category, surface, entity_id) AS $AliasValues,
         | men AS MATERIALIZED (SELECT DISTINCT d.doc_id, dict.category,
         |   dict.entity_id FROM documents d CROSS JOIN dict
         |  WHERE position(surface in d.text) > 0),
         | tr AS (SELECT DISTINCT entity_id AS subj, $PredCase AS pred,
         |   'doc://' || doc_id AS obj FROM men),
         | meta AS (SELECT 'doc://' || doc_id AS subj, source AS obj
         |  FROM documents)
         | SELECT p.subj AS a, p.obj AS d, c.subj AS b, m.obj AS src
         | FROM tr p
         | JOIN tr c ON c.obj = p.obj AND c.pred = 'consumes'
         | JOIN meta m ON m.subj = p.obj
         | WHERE p.pred = 'performs'
         |  AND p.subj IN ('ent:merge', 'ent:sort', 'ent:table_scan')
         |  AND p.subj < c.subj AND m.obj != 'src7'"""
        .stripMargin.replaceAll("\n", " "),
    // q131: the q123 usage union profiled per (type, pred); the mean is
    // exact integer micros (// is DuckDB integer division)
    "q131_shape_induction" ->
      s"""WITH dict(category, surface, entity_id) AS $AliasValues,
         | men AS MATERIALIZED (SELECT DISTINCT d.doc_id, dict.category,
         |   dict.entity_id FROM documents d CROSS JOIN dict
         |  WHERE position(surface in d.text) > 0),
         | tr AS (SELECT DISTINCT entity_id AS subj, $PredCase AS pred,
         |   'doc://' || doc_id AS obj FROM men
         |  UNION
         |  SELECT DISTINCT a.entity_id, 'cooccurs_with', b.entity_id
         |  FROM men a JOIN men b ON a.doc_id = b.doc_id
         |   AND a.entity_id <> b.entity_id),
         | cnt AS (SELECT subj, pred, count(*) AS n_obj FROM tr
         |  GROUP BY 1, 2),
         | ty AS (SELECT DISTINCT entity_id AS subj, category AS subj_type
         |  FROM men)
         | SELECT ty.subj_type, cnt.pred, count(*)::BIGINT AS n_subjects,
         |  min(cnt.n_obj) AS cnt_min, max(cnt.n_obj) AS cnt_max,
         |  CAST((sum(cnt.n_obj) * 1000000) // count(*) AS BIGINT)
         |   AS mean_cnt_micro
         | FROM cnt JOIN ty ON ty.subj = cnt.subj
         | GROUP BY 1, 2""".stripMargin.replaceAll("\n", " "),
    // q132: cells via the q87 fixed-bound series, centroids rounded to 4
    // BEFORE the cosine (identical operands cross-engine), bottom-k per
    // label with the vec_id tie-break
    "q132_label_outliers" ->
      s"""WITH cells AS (SELECT vec_id, label, g.j - 1 AS j,
         |   e.embedding[g.j]::double AS v
         |  FROM embeddings e CROSS JOIN generate_series(1, 64) g(j)),
         | cent AS (SELECT label, j, round(avg(v), 4) AS c
         |  FROM cells GROUP BY 1, 2),
         | sc AS (SELECT vec_id, cells.label,
         |   round(sum(v * c) / (sqrt(sum(v * v)) * sqrt(sum(c * c))), 4)
         |    AS cos_sim
         |  FROM cells JOIN cent ON cent.label = cells.label
         |   AND cent.j = cells.j
         |  GROUP BY 1, 2),
         | rk AS (SELECT label, vec_id, cos_sim, row_number() OVER
         |   (PARTITION BY label ORDER BY cos_sim ASC, vec_id ASC) AS rnk
         |  FROM sc)
         | SELECT label, rnk::int AS rnk, vec_id, cos_sim FROM rk
         | WHERE rnk <= $OutlierK""".stripMargin.replaceAll("\n", " "),
    // q133: bag union with NULL padding on the unshared variable — the
    // branches replay as UNION ALL over the same KG + meta derivation
    "q133_bgp_union" ->
      s"""WITH dict(category, surface, entity_id) AS $AliasValues,
         | men AS MATERIALIZED (SELECT DISTINCT d.doc_id, dict.category,
         |   dict.entity_id FROM documents d CROSS JOIN dict
         |  WHERE position(surface in d.text) > 0),
         | tr AS (SELECT DISTINCT entity_id AS subj, $PredCase AS pred,
         |   'doc://' || doc_id AS obj FROM men),
         | meta AS (SELECT 'doc://' || doc_id AS subj, source AS obj
         |  FROM documents)
         | SELECT subj AS e, obj AS d, CAST(NULL AS VARCHAR) AS src
         | FROM tr WHERE pred = 'performs'
         | UNION ALL
         | SELECT c.subj, c.obj, m.obj FROM tr c
         | JOIN meta m ON m.subj = c.obj
         | WHERE c.pred = 'consumes'""".stripMargin.replaceAll("\n", " "),
    // q134: the same derivation aggregated per entity; the (n_pages
    // DESC, e) order is total, so the LIMIT cut is deterministic
    "q134_bgp_aggregate" ->
      s"""WITH dict(category, surface, entity_id) AS $AliasValues,
         | men AS MATERIALIZED (SELECT DISTINCT d.doc_id, dict.category,
         |   dict.entity_id FROM documents d CROSS JOIN dict
         |  WHERE position(surface in d.text) > 0),
         | tr AS (SELECT DISTINCT entity_id AS subj, $PredCase AS pred,
         |   'doc://' || doc_id AS obj FROM men)
         | SELECT subj AS e, count(obj) AS n_pages, min(obj) AS first_page,
         |  max(obj) AS last_page
         | FROM tr WHERE pred = 'performs' GROUP BY 1
         | HAVING count(obj) >= 2
         | ORDER BY n_pages DESC, e LIMIT 10"""
        .stripMargin.replaceAll("\n", " "),
    // q135: the integer HITS rounds unrolled as CTEs over the same
    // entity→page grounding edges (pred-independent, so no PredCase)
    "q135_hits" -> graft.kg.Hits.oracleSql(
      s"""SELECT entity_id AS src, 'doc://' || d.doc_id AS dst
         | FROM documents d
         |  CROSS JOIN $AliasValues AS dict(category, surface, entity_id)
         | WHERE position(surface in d.text) > 0"""
        .stripMargin.replaceAll("\n", " "), HitsIters),
    // q136: the CONSTRUCT templates replayed as a UNION ALL of projected
    // selects over the star-join solutions, DISTINCT for graph set
    // semantics
    "q136_bgp_construct" ->
      s"""WITH dict(category, surface, entity_id) AS $AliasValues,
         | men AS MATERIALIZED (SELECT DISTINCT d.doc_id, dict.category,
         |   dict.entity_id FROM documents d CROSS JOIN dict
         |  WHERE position(surface in d.text) > 0),
         | tr AS (SELECT DISTINCT entity_id AS subj, $PredCase AS pred,
         |   'doc://' || doc_id AS obj FROM men),
         | sol AS (SELECT p.subj AS a, c.subj AS b, p.obj AS d
         |  FROM tr p JOIN tr c ON c.obj = p.obj
         |  WHERE p.pred = 'performs' AND c.pred = 'consumes')
         | SELECT DISTINCT subj, pred, obj FROM (
         |  SELECT a AS subj, 'processes' AS pred, b AS obj FROM sol
         |  UNION ALL SELECT b, 'processed_by', a FROM sol
         |  UNION ALL SELECT a, 'grounded_in', d FROM sol)"""
        .stripMargin.replaceAll("\n", " "),
    // q137: GROUP_CONCAT pinned to DISTINCT+sorted on both engines
    // (string_agg with DISTINCT and ORDER BY replays the array_sort)
    "q137_bgp_group_concat" ->
      s"""WITH dict(category, surface, entity_id) AS $AliasValues,
         | men AS MATERIALIZED (SELECT DISTINCT d.doc_id, dict.category,
         |   dict.entity_id FROM documents d CROSS JOIN dict
         |  WHERE position(surface in d.text) > 0),
         | tr AS (SELECT DISTINCT entity_id AS subj, $PredCase AS pred,
         |   'doc://' || doc_id AS obj FROM men)
         | SELECT subj AS e,
         |  string_agg(DISTINCT obj, '|' ORDER BY obj) AS pages,
         |  count(obj) AS n_pages
         | FROM tr WHERE pred = 'consumes' GROUP BY 1"""
        .stripMargin.replaceAll("\n", " "),
    // q138: SCC by definition — full directed transitive closure over
    // the same md5-gated/oriented graph, scc(v) = min u with mutual
    // reachability (v itself when none)
    "q138_scc" ->
      s"""WITH RECURSIVE $SccOracleCtes
         | SELECT node, scc FROM scc""".stripMargin.replaceAll("\n", " "),
    // q150: the condensation DAG replayed over the SAME scc labeling —
    // cross-component edge groups with distinct-edge multiplicity
    "q150_condensation" ->
      s"""WITH RECURSIVE $SccOracleCtes
         | SELECT s1.scc AS csrc, s2.scc AS cdst, count(*) AS n_edges
         | FROM ed e JOIN scc s1 ON s1.node = e.src
         |  JOIN scc s2 ON s2.node = e.dst
         | WHERE s1.scc != s2.scc GROUP BY 1, 2"""
        .stripMargin.replaceAll("\n", " "),
    // q149: the landmark distance distribution + effective-diameter
    // curve over the same multi-source frame as q144/q145
    "q149_distance_distribution" ->
      s"""WITH RECURSIVE $LandmarkBfsCtes,
         | dd AS (SELECT dist, count(*) AS n_pairs FROM mind
         |  WHERE dist > 0 GROUP BY dist),
         | t AS (SELECT sum(n_pairs)::BIGINT AS tot FROM dd)
         | SELECT dist, n_pairs,
         |  (sum(n_pairs) OVER w)::BIGINT AS cum_pairs,
         |  ((sum(n_pairs) OVER w) * 1000000 // t.tot)::BIGINT AS cum_micro
         | FROM dd CROSS JOIN t
         | WINDOW w AS (ORDER BY dist ROWS UNBOUNDED PRECEDING)"""
        .stripMargin.replaceAll("\n", " "),
    // q151: bounded weighted-path enumeration over the shared weighted
    // graph; best dist per node, then min seed among paths achieving it
    // — the (dist, seed) lexicographic semiring replayed set-wise
    "q151_weighted_sssp" ->
      s"""WITH RECURSIVE $LandmarkBfsCtes, $WeightedEdgeCtes, $SsspBestCtes
         | SELECT node, dist, seed FROM best"""
        .stripMargin.replaceAll("\n", " "),
    // q165: the routing tree on top of the SAME best frame — parent =
    // min neighbor whose dist + edge weight lands exactly on the
    // node's dist with the same seed; seeds keep NULL
    "q165_routing_tree" ->
      s"""WITH RECURSIVE $LandmarkBfsCtes, $WeightedEdgeCtes, $SsspBestCtes,
         | par AS (SELECT e.v AS node, min(e.u) AS parent
         |  FROM wsym e JOIN best p ON p.node = e.u
         |   JOIN best nn ON nn.node = e.v
         |  WHERE p.dist + e.w = nn.dist AND p.seed = nn.seed
         |  GROUP BY e.v)
         | SELECT b.node, b.dist, b.seed, par.parent FROM best b
         | LEFT JOIN par ON par.node = b.node"""
        .stripMargin.replaceAll("\n", " "),
    // q166: the weighted walks unrolled with the same inverse-CDF
    // interval arithmetic over the cumulative-weight window
    "q166_weighted_walks" ->
      graft.kg.RandomWalks.weightedOracleSql(WeightedLandmarkEdgesSql,
        WalksPerNode, WalkSteps),
    // q167: the same sweep with one single-node window — candidates
    // per x, survivor iff every smaller x has larger min-y
    "q167_skyline" ->
      """WITH p AS (SELECT DISTINCT l_extendedprice::DOUBLE AS x,
        |   l_quantity::DOUBLE AS y FROM lineitem),
        | perx AS (SELECT x, min(y) AS my FROM p GROUP BY x),
        | pm AS (SELECT x, my, min(my) OVER (ORDER BY x
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmin
        |  FROM perx)
        | SELECT x, my AS y FROM pm
        | WHERE prevmin IS NULL OR prevmin > my"""
        .stripMargin.replaceAll("\n", " "),
    // q168: the modifier stack replayed — DISTINCT solutions, the
    // determinism-extended total order, then the page cut
    "q168_bgp_modifiers" ->
      s"""WITH dict(category, surface, entity_id) AS $AliasValues,
         | men AS MATERIALIZED (SELECT DISTINCT d.doc_id, dict.category,
         |   dict.entity_id FROM documents d CROSS JOIN dict
         |  WHERE position(surface in d.text) > 0),
         | tr AS (SELECT DISTINCT entity_id AS subj, $PredCase AS pred,
         |   'doc://' || doc_id AS obj FROM men
         |  UNION
         |  SELECT DISTINCT a.entity_id, 'cooccurs_with', b.entity_id
         |  FROM men a JOIN men b ON a.doc_id = b.doc_id
         |   AND a.entity_id <> b.entity_id)
         | SELECT subj AS e, obj AS d FROM (SELECT DISTINCT subj, obj
         |  FROM tr WHERE pred = 'performs')
         | ORDER BY subj DESC, obj ASC LIMIT 20 OFFSET 5"""
        .stripMargin.replaceAll("\n", " "),
    // q169: the HRW argmax replayed with the same salted md5 and the
    // same (h DESC, shard DESC) tie rule
    "q169_rendezvous" ->
      """WITH sh(shard) AS (VALUES ('shard-a'), ('shard-b'), ('shard-c'),
        |  ('shard-d'), ('shard-e')),
        | h AS (SELECT doc_id, shard, ('0x' || substr(md5(
        |    doc_id::varchar || '#' || shard), 1, 8))::BIGINT
        |    % 1000000007 AS h
        |  FROM documents CROSS JOIN sh),
        | r AS (SELECT doc_id, shard, row_number() OVER
        |   (PARTITION BY doc_id ORDER BY h DESC, shard DESC) AS rn
        |  FROM h)
        | SELECT doc_id, shard FROM r WHERE rn = 1"""
        .stripMargin.replaceAll("\n", " "),
    // q171 static fallback: 12 unrolled Luby rounds (extra rounds are
    // idempotent); oracleSqlFor replaces with the measured count
    "q171_mis" -> graft.kg.Mis.oracleSql(LandmarkCanonSql, 12),
    // q174: bow-tie regions replayed over the q138 CTEs — core = the
    // largest SCC (min-label tie), in/out via node-level reach
    // EXISTS against core members (equivalent to the engine's
    // component-level closure tests: a node reaches the core iff its
    // component does)
    "q174_bowtie" ->
      s"""WITH RECURSIVE $SccOracleCtes,
         | sz AS (SELECT scc, count(*) AS sz FROM scc GROUP BY scc),
         | core AS (SELECT scc FROM sz ORDER BY sz DESC, scc ASC LIMIT 1)
         | SELECT s.node,
         |  CASE WHEN s.scc = (SELECT scc FROM core) THEN 'core'
         |   WHEN EXISTS (SELECT 1 FROM reach r JOIN scc t
         |     ON t.node = r.dst WHERE r.src = s.node
         |      AND t.scc = (SELECT scc FROM core)) THEN 'in'
         |   WHEN EXISTS (SELECT 1 FROM reach r JOIN scc t
         |     ON t.node = r.src WHERE r.dst = s.node
         |      AND t.scc = (SELECT scc FROM core)) THEN 'out'
         |   ELSE 'other' END AS region
         | FROM scc s""".stripMargin.replaceAll("\n", " "),
    // q175 static fallback: 12 unrolled peel rounds; oracleSqlFor
    // replaces with the measured count (+1 idempotent slack)
    "q175_score" ->
      graft.kg.KCore.strengthOracleSql(WeightedLandmarkEdgesSql, SCoreS, 12),
    // q172: the (performs/^consumes) hop + its recursive closure —
    // the engine's doubling fixpoint against the linear recursion
    "q172_rpq_closure" ->
      s"""WITH RECURSIVE dict(category, surface, entity_id) AS $AliasValues,
         | men AS MATERIALIZED (SELECT DISTINCT d.doc_id, dict.category,
         |   dict.entity_id FROM documents d CROSS JOIN dict
         |  WHERE position(surface in d.text) > 0),
         | tr AS (SELECT DISTINCT entity_id AS subj, $PredCase AS pred,
         |   'doc://' || doc_id AS obj FROM men),
         | hop AS MATERIALIZED (SELECT DISTINCT p.subj AS src,
         |   c.subj AS dst FROM tr p JOIN tr c ON c.obj = p.obj
         |   AND c.pred = 'consumes' WHERE p.pred = 'performs'),
         | reach(src, dst) AS (SELECT src, dst FROM hop
         |  UNION SELECT r.src, h.dst FROM reach r
         |   JOIN hop h ON h.src = r.dst)
         | SELECT src, dst FROM reach""".stripMargin.replaceAll("\n", " "),
    // q170: the q72 score replay binned fixed-width against the
    // planted language outcome
    "q170_calibration" ->
      s"""WITH $HashedTfCtes,
         | cells AS (SELECT dense.doc_id, j::int AS j,
         |   coalesce(round(raw / nullif(n2, 0), 6), 0.0) AS v
         |  FROM dense JOIN nrm ON dense.doc_id = nrm.doc_id),
         | sc AS (SELECT doc_id, round(1 / (1 + exp(-raw)), 4) AS quality
         |  FROM (SELECT doc_id, sum(v * (((j % 7) - 3) / 3.0)) AS raw
         |        FROM cells GROUP BY doc_id)),
         | b AS (SELECT least(9, floor(quality * 10))::BIGINT AS bin,
         |   quality, CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS o
         |  FROM sc JOIN documents d ON d.doc_id = sc.doc_id)
         | SELECT bin, count(*)::BIGINT AS n,
         |  round(avg(quality), 4) AS mean_score,
         |  round(avg(o), 4) AS outcome_rate
         | FROM b GROUP BY bin""".stripMargin.replaceAll("\n", " "),
    // q152: the round-free cut-property replay of the unique MSF — an
    // edge is IN iff its endpoints are not connected by strictly
    // (w, u, v)-smaller edges (Kruskal's invariant under the total
    // order); reachability per candidate edge as a bounded recursion
    "q152_mst" ->
      s"""WITH RECURSIVE $LandmarkBfsCtes, $WeightedEdgeCtes,
         | r(eu, ev, ew, node) AS (
         |  SELECT u, v, w, u FROM wcanon
         |  UNION SELECT r.eu, r.ev, r.ew, s.v FROM r
         |   JOIN wsym s ON s.u = r.node
         |   WHERE s.w < r.ew OR (s.w = r.ew AND
         |    (least(s.u, s.v) < r.eu OR (least(s.u, s.v) = r.eu
         |      AND greatest(s.u, s.v) < r.ev))))
         | SELECT u, v, w FROM wcanon e WHERE NOT EXISTS (
         |  SELECT 1 FROM r WHERE r.eu = e.u AND r.ev = e.v
         |   AND r.node = e.v)"""
        .stripMargin.replaceAll("\n", " "),
    // q153: the full transitive closure IS the q138 CTEs' reach table —
    // the oracle replays it directly; the engine factors through the
    // condensation, the replay recurses over raw edges: same set
    "q153_reachability" ->
      s"""WITH RECURSIVE $SccOracleCtes
         | SELECT src, dst FROM reach""".stripMargin.replaceAll("\n", " "),
    // q154: DESCRIBE = triples whose subj OR obj binds ?e in
    // { ?e uses_tool ?d }, over the q123 usage union
    "q154_bgp_describe" ->
      s"""WITH dict(category, surface, entity_id) AS $AliasValues,
         | men AS MATERIALIZED (SELECT DISTINCT d.doc_id, dict.category,
         |   dict.entity_id FROM documents d CROSS JOIN dict
         |  WHERE position(surface in d.text) > 0),
         | tr AS (SELECT DISTINCT entity_id AS subj, $PredCase AS pred,
         |   'doc://' || doc_id AS obj FROM men
         |  UNION
         |  SELECT DISTINCT a.entity_id, 'cooccurs_with', b.entity_id
         |  FROM men a JOIN men b ON a.doc_id = b.doc_id
         |   AND a.entity_id <> b.entity_id),
         | sols AS (SELECT DISTINCT subj AS node FROM tr
         |  WHERE pred = 'uses_tool')
         | SELECT DISTINCT t.subj, t.pred, t.obj FROM tr t
         | WHERE t.subj IN (SELECT node FROM sols)
         |  OR t.obj IN (SELECT node FROM sols)"""
        .stripMargin.replaceAll("\n", " "),
    // q155: ASK per probe — EXISTS over the same usage union
    "q155_bgp_ask" ->
      s"""WITH dict(category, surface, entity_id) AS $AliasValues,
         | men AS MATERIALIZED (SELECT DISTINCT d.doc_id, dict.category,
         |   dict.entity_id FROM documents d CROSS JOIN dict
         |  WHERE position(surface in d.text) > 0),
         | tr AS (SELECT DISTINCT entity_id AS subj, $PredCase AS pred,
         |   'doc://' || doc_id AS obj FROM men
         |  UNION
         |  SELECT DISTINCT a.entity_id, 'cooccurs_with', b.entity_id
         |  FROM men a JOIN men b ON a.doc_id = b.doc_id
         |   AND a.entity_id <> b.entity_id)
         | SELECT 'performs' AS q,
         |  EXISTS(SELECT 1 FROM tr WHERE pred = 'performs') AS ask
         | UNION ALL SELECT 'defragments' AS q,
         |  EXISTS(SELECT 1 FROM tr WHERE pred = 'defragments') AS ask"""
        .stripMargin.replaceAll("\n", " "),
    // q156: 2 unrolled Lloyd rounds over offset-quantized integer
    // cells — seeds = 4 smallest vec_ids, ties on (d2, cluster), empty
    // clusters keep their centroid via the LEFT join; every sum cast
    // back to BIGINT (DuckDB sums BIGINT into HUGEINT)
    "q156_kmeans" ->
      s"""WITH cells AS (SELECT vec_id, g.j - 1 AS j,
         |   round(e.embedding[g.j]::DOUBLE * 10000)::BIGINT
         |    + ${graft.sim.KMeans.Offset} AS vi
         |  FROM embeddings e CROSS JOIN generate_series(1, 64) g(j)),
         | sd AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id)::BIGINT
         |   AS cluster
         |  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4)),
         | c0 AS (SELECT sd.cluster, c.j, c.vi AS ci FROM cells c
         |  JOIN sd ON sd.vec_id = c.vec_id),
         | d1 AS (SELECT c.vec_id, k.cluster,
         |   sum((c.vi - k.ci) * (c.vi - k.ci))::BIGINT AS d2
         |  FROM cells c JOIN c0 k ON k.j = c.j GROUP BY 1, 2),
         | a1 AS (SELECT vec_id, cluster FROM (SELECT vec_id, cluster,
         |   row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster)
         |    AS rn FROM d1) WHERE rn = 1),
         | m1 AS (SELECT a.cluster, c.j,
         |   (sum(c.vi) // count(*))::BIGINT AS mi
         |  FROM cells c JOIN a1 a ON a.vec_id = c.vec_id GROUP BY 1, 2),
         | c1 AS (SELECT k.cluster, k.j, coalesce(m.mi, k.ci) AS ci
         |  FROM c0 k LEFT JOIN m1 m ON m.cluster = k.cluster
         |   AND m.j = k.j),
         | dt AS (SELECT c.vec_id, k.cluster,
         |   sum((c.vi - k.ci) * (c.vi - k.ci))::BIGINT AS d2
         |  FROM cells c JOIN c1 k ON k.j = c.j GROUP BY 1, 2)
         | SELECT vec_id, cluster, d2 AS dist2 FROM (SELECT vec_id,
         |  cluster, d2, row_number() OVER (PARTITION BY vec_id
         |   ORDER BY d2, cluster) AS rn FROM dt) WHERE rn = 1"""
        .stripMargin.replaceAll("\n", " "),
    // q157: per-source numeric aggregates over the distinct
    // (doc, value) measurement bindings — SUM exact, AVG by integer
    // division (operands non-negative, so // and DIV agree)
    "q157_bgp_sum_avg" ->
      s"""WITH meas AS (${measurementsSql(4096)}),
         | vals AS (SELECT DISTINCT m.doc_id, m.value_si_micro FROM meas m
         |  WHERE m.si_unit = 'm')
         | SELECT d.source AS src, count(*)::BIGINT AS n_vals,
         |  sum(v.value_si_micro)::BIGINT AS total_micro,
         |  (sum(v.value_si_micro) // count(*))::BIGINT AS avg_micro
         | FROM vals v JOIN documents d ON d.doc_id = v.doc_id
         | GROUP BY d.source""".stripMargin.replaceAll("\n", " "),
    // q158: the HLL registers + raw estimate replayed with the same
    // 60-bit md5 hash, bucket = low 6 bits, rank = highest-set-bit
    // position of the remaining 54 (capped 31), harmonic fold and the
    // final division all exact BIGINTs
    "q158_hll_tokens" -> HllTokensSql,
    // q173: the SAME whole-corpus replay — a green row against the
    // shard-merged engine output proves the HLL merge law exactly
    "q173_hll_merge" -> HllTokensSql,
    // q159: the gaps-and-islands window replayed verbatim — new island
    // when start exceeds the running max of previous ends
    "q159_interval_islands" ->
      """WITH iv AS (SELECT user_id, event_id,
        |   floor(epoch(ts::timestamp))::bigint AS s,
        |   floor(epoch(ts::timestamp))::bigint + event_id % 300 + 60 AS e
        |  FROM events),
        | fl AS (SELECT user_id, event_id, s, e,
        |   CASE WHEN max(e) OVER pm IS NULL OR s > max(e) OVER pm
        |    THEN 1 ELSE 0 END AS isnew
        |  FROM iv WINDOW pm AS (PARTITION BY user_id
        |   ORDER BY s, e, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        | isl AS (SELECT user_id, s, e, sum(isnew) OVER
        |   (PARTITION BY user_id ORDER BY s, e, event_id
        |    ROWS UNBOUNDED PRECEDING) AS island FROM fl)
        | SELECT user_id, island::BIGINT AS island,
        |  min(s)::BIGINT AS island_start, max(e)::BIGINT AS island_end,
        |  count(*)::BIGINT AS n_intervals
        | FROM isl GROUP BY user_id, island"""
        .stripMargin.replaceAll("\n", " "),
    // q160: brute-force all-pairs Jaccard over the same 3-gram prints —
    // the prefix filter is lossless by theorem, so the exhaustive
    // replay IS the contract; the gate cross-multiplies, no division
    "q160_setsim_join" ->
      """WITH toks AS (SELECT doc_id,
        |   string_split_regex(trim(text), '\s+') AS t FROM documents),
        | sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |   range(1, len(t) - 1),
        |   i -> list_aggregate(t[i:i+2], 'string_agg', ' ')))) AS g
        |  FROM toks WHERE len(t) >= 3),
        | fp AS (SELECT DISTINCT doc_id,
        |   ('0x' || substr(md5(g), 1, 12))::BIGINT AS gh FROM sh),
        | ln AS (SELECT doc_id, count(*) AS len FROM fp GROUP BY doc_id),
        | pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |   count(*) AS inter FROM fp a JOIN fp b ON a.gh = b.gh
        |   AND a.doc_id < b.doc_id GROUP BY 1, 2)
        | SELECT p.doc_a, p.doc_b, p.inter::BIGINT AS inter,
        |  (la.len + lb.len - p.inter)::BIGINT AS union_sz,
        |  ((p.inter * 1000000) // (la.len + lb.len - p.inter))::BIGINT
        |   AS jacc_micro
        | FROM pairs p JOIN ln la ON la.doc_id = p.doc_a
        |  JOIN ln lb ON lb.doc_id = p.doc_b
        | WHERE p.inter * 1000000 >= (la.len + lb.len - p.inter) * 500000"""
        .stripMargin.replaceAll("\n", " "),
    // q161: the filter bits and all three salted probes replayed with
    // the shared md5 bucket formula; is_fp = passed but not a member
    "q161_bloom_join" ->
      s"""WITH neg AS (SELECT c_custkey FROM customer WHERE c_acctbal < 0),
         | bits AS (SELECT DISTINCT ('0x' || substr(md5(
         |    c_custkey::varchar || '#' || i), 1, 8))::BIGINT % $BloomBits
         |   AS bit FROM neg CROSS JOIN (SELECT unnest([0, 1, 2]) AS i)),
         | pass AS (SELECT o_orderkey, o_custkey FROM orders p
         |  WHERE EXISTS (SELECT 1 FROM bits b WHERE b.bit = ('0x' ||
         |    substr(md5(p.o_custkey::varchar || '#0'), 1, 8))::BIGINT
         |     % $BloomBits)
         |   AND EXISTS (SELECT 1 FROM bits b WHERE b.bit = ('0x' ||
         |    substr(md5(p.o_custkey::varchar || '#1'), 1, 8))::BIGINT
         |     % $BloomBits)
         |   AND EXISTS (SELECT 1 FROM bits b WHERE b.bit = ('0x' ||
         |    substr(md5(p.o_custkey::varchar || '#2'), 1, 8))::BIGINT
         |     % $BloomBits))
         | SELECT p.o_orderkey, p.o_custkey, (n.c_custkey IS NULL) AS is_fp
         | FROM pass p LEFT JOIN neg n ON n.c_custkey = p.o_custkey"""
        .stripMargin.replaceAll("\n", " "),
    // q162: the funnel's conditional-min cascade replayed step by step
    // — CASE-gated mins so out-of-window users keep NULL, not a drop
    "q162_funnel" ->
      """WITH e AS (SELECT user_id, event_type,
        |   floor(epoch(ts::timestamp))::bigint AS sec FROM events),
        | s1 AS (SELECT user_id, min(sec) AS t1 FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        | s2 AS (SELECT s1.user_id, s1.t1,
        |   min(CASE WHEN e.sec > s1.t1 AND e.sec <= s1.t1 + 604800
        |    THEN e.sec END) AS t2
        |  FROM s1 LEFT JOIN e ON e.user_id = s1.user_id
        |   AND e.event_type = 'click' GROUP BY 1, 2),
        | s3 AS (SELECT s2.user_id, s2.t1, s2.t2,
        |   min(CASE WHEN e.sec > s2.t2 AND e.sec <= s2.t2 + 604800
        |    THEN e.sec END) AS t3
        |  FROM s2 LEFT JOIN e ON e.user_id = s2.user_id
        |   AND e.event_type = 'purchase' GROUP BY 1, 2, 3)
        | SELECT user_id, t1, t2, t3,
        |  (1 + CASE WHEN t2 IS NULL THEN 0 ELSE 1 END
        |     + CASE WHEN t3 IS NULL THEN 0 ELSE 1 END)::BIGINT AS reached
        | FROM s3""".stripMargin.replaceAll("\n", " "),
    // q163: boundaries re-derived as round-4 quantile_cont (the q55
    // pairing), assignment replayed as a list_filter count
    "q163_equidepth_hist" ->
      s"""WITH bs AS (SELECT list_transform(quantile_cont(
         |   l_extendedprice, [${(1 until 16).map(i => i / 16.0)
             .mkString(", ")}]), x -> round(x, 4)) AS b FROM lineitem),
         | v AS (SELECT l_extendedprice::DOUBLE AS v FROM lineitem)
         | SELECT len(list_filter(bs.b, x -> x < v.v))::BIGINT AS bucket,
         |  count(*)::BIGINT AS n, count(DISTINCT v.v)::BIGINT AS ndv,
         |  min(v.v) AS min_v, max(v.v) AS max_v
         | FROM v CROSS JOIN bs GROUP BY 1"""
        .stripMargin.replaceAll("\n", " "),
    // q164: brute-force levenshtein over all distinct name pairs — the
    // deletion-neighborhood blocking is complete for k = 1 by theorem,
    // so the exhaustive replay IS the contract (the q160 pattern)
    "q164_editdist_join" ->
      """WITH n AS (SELECT DISTINCT c_name AS name FROM customer)
        | SELECT a.name AS a, b.name AS b,
        |  levenshtein(a.name, b.name)::BIGINT AS dist
        | FROM n a JOIN n b ON a.name < b.name
        | WHERE levenshtein(a.name, b.name) <= 1"""
        .stripMargin.replaceAll("\n", " "),
    // q139: longest incoming path per node via the recursive path-depth
    // CTE over the same co-purchase DAG (u < v, so it terminates)
    "q139_dag_layers" ->
      s"""WITH RECURSIVE $CopurchaseEdgesCtes,
         | lvl(node, d) AS (SELECT v, 1::BIGINT FROM e
         |  UNION SELECT e2.v, l.d + 1 FROM lvl l JOIN e e2 ON e2.u = l.node),
         | nd AS (SELECT u AS node FROM e UNION SELECT v FROM e)
         | SELECT nd.node, coalesce(max(l.d), 0)::BIGINT AS layer
         | FROM nd LEFT JOIN lvl l ON l.node = nd.node GROUP BY nd.node"""
        .stripMargin.replaceAll("\n", " "),
    // q140: same head (freq desc, tok) and the same regr_slope fit
    "q140_zipf" -> graft.quality.Zipf.oracleSql(100),
    // q141: PageRank unrolled over the same distinct-adjacency edges
    // (static token bound; oracleSqlFor swaps in the measured one)
    "q141_textrank" -> graft.kg.PageRank.oracleSql(
      graft.quality.TextRank.edgesSql(4096), 10),
    // q142: the identical gaps-and-islands windows per entity
    "q142_scd2_history" ->
      """WITH ch AS (SELECT o_custkey AS entity, o_orderstatus AS value,
        |   o_orderdate::DATE AS ts, o_orderkey AS tie FROM orders),
        | f AS (SELECT entity, value, ts, tie,
        |   CASE WHEN value IS DISTINCT FROM lag(value) OVER
        |     (PARTITION BY entity ORDER BY ts, tie) THEN 1 ELSE 0 END AS chg
        |  FROM ch),
        | v AS (SELECT entity, value, ts, (sum(chg) OVER
        |    (PARTITION BY entity ORDER BY ts, tie
        |     ROWS UNBOUNDED PRECEDING))::BIGINT AS version FROM f),
        | runs AS (SELECT entity, version, min(value) AS value,
        |   min(ts) AS valid_from, count(*) AS n_rows FROM v GROUP BY 1, 2)
        | SELECT entity, value, version, valid_from,
        |  coalesce(lead(valid_from) OVER w, DATE '9999-12-31') AS valid_to,
        |  n_rows,
        |  (lead(valid_from) OVER w IS NULL) AS is_current
        | FROM runs WINDOW w AS (PARTITION BY entity ORDER BY version)"""
        .stripMargin.replaceAll("\n", " "),
    // q143: per-length side counts, the same CDF prefix windows, the
    // same IEEE double division — max gap, ties to the smallest length
    "q143_ks_drift" ->
      """WITH d AS (SELECT
        |   ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 2 AS side,
        |   length(text)::BIGINT AS x FROM documents),
        | pv AS (SELECT x, count(*) FILTER (WHERE side = 0) AS c_left,
        |   count(*) FILTER (WHERE side = 1) AS c_right FROM d GROUP BY x),
        | n AS (SELECT sum(c_left)::BIGINT AS nl, sum(c_right)::BIGINT AS nr
        |       FROM pv),
        | cdf AS (SELECT x,
        |   abs((sum(c_left) OVER w)::DOUBLE / n.nl -
        |       (sum(c_right) OVER w)::DOUBLE / n.nr) AS gap
        |  FROM pv CROSS JOIN n
        |  WINDOW w AS (ORDER BY x ROWS UNBOUNDED PRECEDING))
        | SELECT cdf.x AS ks_at, round(cdf.gap, 6) AS ks_stat,
        |  n.nl AS n_left, n.nr AS n_right
        | FROM cdf CROSS JOIN n ORDER BY cdf.gap DESC, cdf.x LIMIT 1"""
        .stripMargin.replaceAll("\n", " "),
    // q144/q145: landmark BFS replayed as a seed-keyed recursive CTE over
    // the same thinned undirected graph; min dist per (seed, node), then
    // the ecc / harmonic aggregates. Same derivation as q138's edges
    // minus the orientation.
    "q144_eccentricity" ->
      s"""WITH RECURSIVE $LandmarkBfsCtes
         | SELECT seed, max(dist) AS ecc, count(*) AS n_reached
         | FROM mind GROUP BY seed"""
        .stripMargin.replaceAll("\n", " "),
    "q145_harmonic" ->
      s"""WITH RECURSIVE $LandmarkBfsCtes
         | SELECT node, count(*) AS n_seeds,
         |  sum(1000000 // dist)::BIGINT AS harmonic_micro
         | FROM mind WHERE dist > 0 GROUP BY node"""
        .stripMargin.replaceAll("\n", " "),
    // q146: the identical integer systematic-PPS arithmetic over a plain
    // window prefix sum (the oracle needs no bucketing — DuckDB sorts)
    "q146_weighted_sample" ->
      """WITH wt AS (SELECT doc_id, n_chars AS w FROM documents),
        | tot AS (SELECT greatest(sum(w) // 100, 1)::BIGINT AS step FROM wt),
        | off AS (SELECT doc_id, w, coalesce(sum(w) OVER
        |   (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND
        |    1 PRECEDING), 0)::BIGINT AS start_offset FROM wt)
        | SELECT doc_id, w, start_offset,
        |  ((start_offset + w) // tot.step > start_offset // tot.step)
        |    AS picked
        | FROM off CROSS JOIN tot"""
        .stripMargin.replaceAll("\n", " "),
    // q147: the Sums iteration unrolled 3 rounds over the shared q104
    // claims body — fixed iteration count, so the oracle is static
    "q147_truth_discovery" ->
      graft.kg.Fusion.iterativeTruthOracleSql(FusionClaimsBodySql, 3),
    // q129/q130: the correlated filter-subquery pair replayed as native
    // NOT EXISTS / EXISTS over the same KG derivation
    "q129_bgp_not_exists" ->
      s"""WITH dict(category, surface, entity_id) AS $AliasValues,
         | men AS MATERIALIZED (SELECT DISTINCT d.doc_id, dict.category,
         |   dict.entity_id FROM documents d CROSS JOIN dict
         |  WHERE position(surface in d.text) > 0),
         | tr AS (SELECT DISTINCT entity_id AS subj, $PredCase AS pred,
         |   'doc://' || doc_id AS obj FROM men)
         | SELECT p.subj AS e, p.obj AS d FROM tr p
         | WHERE p.pred = 'performs'
         |  AND NOT EXISTS (SELECT 1 FROM tr x
         |   WHERE x.pred = 'involves' AND x.obj = p.obj)"""
        .stripMargin.replaceAll("\n", " "),
    "q130_bgp_exists" ->
      s"""WITH dict(category, surface, entity_id) AS $AliasValues,
         | men AS MATERIALIZED (SELECT DISTINCT d.doc_id, dict.category,
         |   dict.entity_id FROM documents d CROSS JOIN dict
         |  WHERE position(surface in d.text) > 0),
         | tr AS (SELECT DISTINCT entity_id AS subj, $PredCase AS pred,
         |   'doc://' || doc_id AS obj FROM men)
         | SELECT p.subj AS e, p.obj AS d FROM tr p
         | WHERE p.pred = 'uses_tool'
         |  AND EXISTS (SELECT 1 FROM tr b
         |   WHERE b.pred = 'consumes' AND b.obj = p.obj)"""
        .stripMargin.replaceAll("\n", " "),
    // q128: each leg replayed as an IN-filtered (inverse: column-swapped)
    // scan union, sequenced by one join, DISTINCT for path set semantics
    "q128_property_paths" ->
      s"""WITH dict(category, surface, entity_id) AS $AliasValues,
         | men AS MATERIALIZED (SELECT DISTINCT d.doc_id, dict.category,
         |   dict.entity_id FROM documents d CROSS JOIN dict
         |  WHERE position(surface in d.text) > 0),
         | tr AS (SELECT DISTINCT entity_id AS subj, $PredCase AS pred,
         |   'doc://' || doc_id AS obj FROM men),
         | l1 AS (SELECT subj AS s, obj AS o FROM tr
         |  WHERE pred IN ('performs', 'uses_tool')),
         | l2 AS (SELECT obj AS s, subj AS o FROM tr
         |  WHERE pred IN ('consumes', 'involves'))
         | SELECT DISTINCT l1.s AS subj, l2.o AS obj
         | FROM l1 JOIN l2 ON l1.o = l2.s"""
        .stripMargin.replaceAll("\n", " "),
    // q126: the usage union linearized — per-(subj, pred) objects rank-
    // capped at $LinearizeCap with a visible ',…', string_agg pinned by
    // ORDER BY on both levels (byte-reproducibility is the contract)
    "q126_kg_linearize" ->
      s"""WITH dict(category, surface, entity_id) AS $AliasValues,
         | men AS MATERIALIZED (SELECT DISTINCT d.doc_id, dict.category,
         |   dict.entity_id FROM documents d CROSS JOIN dict
         |  WHERE position(surface in d.text) > 0),
         | tr AS (SELECT DISTINCT entity_id AS subj, $PredCase AS pred,
         |   'doc://' || doc_id AS obj FROM men
         |  UNION
         |  SELECT DISTINCT a.entity_id, 'cooccurs_with', b.entity_id
         |  FROM men a JOIN men b ON a.doc_id = b.doc_id
         |   AND a.entity_id <> b.entity_id),
         | r AS (SELECT subj, pred, obj, row_number() OVER
         |   (PARTITION BY subj, pred ORDER BY obj) AS rn FROM tr),
         | pp AS (SELECT subj, pred || '=' ||
         |   string_agg(CASE WHEN rn <= $LinearizeCap THEN obj END,
         |     ',' ORDER BY obj) ||
         |   CASE WHEN max(rn) > $LinearizeCap THEN ',…' ELSE '' END AS pp
         |  FROM r WHERE rn <= $LinearizeCap + 1 GROUP BY subj, pred),
         | cnt AS (SELECT subj, count(*) AS n_facts FROM tr GROUP BY 1)
         | SELECT pp.subj, cnt.n_facts,
         |  string_agg(pp.pp, '|' ORDER BY pp.pp) AS doc
         | FROM pp JOIN cnt USING (subj) GROUP BY 1, 2"""
        .stripMargin.replaceAll("\n", " "),
    // q108: chain legs — KG triples filtered to 'performs' joined on
    // mid = the doc URI against the doc-metadata 'from_source' triples
    "q108_chain_bgp" ->
      s"""WITH dict(category, surface, entity_id) AS $AliasValues,
         | tr AS (SELECT DISTINCT entity_id AS subj, $PredCase AS pred,
         |   'doc://' || d.doc_id AS obj
         |  FROM documents d CROSS JOIN dict WHERE position(surface in d.text) > 0),
         | a AS (SELECT subj, obj AS mid FROM tr WHERE pred = 'performs'),
         | b AS (SELECT 'doc://' || doc_id AS mid, source AS obj FROM documents)
         | SELECT a.subj, b.obj, count(*) AS n_paths
         | FROM a JOIN b ON a.mid = b.mid GROUP BY 1, 2"""
        .stripMargin.replaceAll("\n", " "),
    // q111: the BGP's three legs as aliased scans of the union KG; bag
    // semantics (no DISTINCT at the end) — triples are distinct, so
    // solution multiplicity is join multiplicity in both engines
    "q111_bgp_compile" ->
      s"""WITH dict(category, surface, entity_id) AS $AliasValues,
         | u AS MATERIALIZED (SELECT DISTINCT entity_id AS subj,
         |   $PredCase AS pred, 'doc://' || d.doc_id AS obj
         |  FROM documents d CROSS JOIN dict
         |  WHERE position(surface in d.text) > 0
         |  UNION ALL
         |  SELECT 'doc://' || doc_id, 'from_source', source FROM documents)
         | SELECT a.subj AS e, a.obj AS d, b.obj AS src, c.subj AS e2
         | FROM u a JOIN u b ON b.subj = a.obj JOIN u c ON c.obj = a.obj
         | WHERE a.pred = 'performs' AND b.pred = 'from_source'
         |  AND c.pred = 'consumes'""".stripMargin.replaceAll("\n", " "),
    // q112: the rule miner's distinct-grounding counts as plain SQL —
    // body = the path self-join collapsed to distinct (p, q, x, z),
    // support = body pairs whose head fact exists; confidences are one
    // exact BIGINT/BIGINT division rounded to 4 decimals on both sides
    "q112_rule_mining" ->
      s"""WITH dict(category, surface, entity_id) AS $AliasValues,
         | men AS MATERIALIZED (SELECT DISTINCT d.doc_id, dict.category,
         |   dict.entity_id FROM documents d CROSS JOIN dict
         |  WHERE position(surface in d.text) > 0),
         | tr AS MATERIALIZED (SELECT DISTINCT entity_id AS subj,
         |   $PredCase AS pred, 'doc://' || doc_id AS obj FROM men),
         | u AS MATERIALIZED (SELECT subj, pred, obj FROM tr
         |  UNION ALL
         |  SELECT DISTINCT a.entity_id, 'cooccurs_with', b.entity_id
         |  FROM men a JOIN men b ON a.doc_id = b.doc_id
         |   AND a.entity_id <> b.entity_id),
         | body AS MATERIALIZED (SELECT DISTINCT a.pred AS body_p,
         |   b.pred AS body_q, a.subj AS x, b.obj AS z
         |  FROM u a JOIN u b ON a.obj = b.subj),
         | nb AS (SELECT body_p, body_q, count(*) AS n_body
         |  FROM body GROUP BY 1, 2),
         | nh AS (SELECT pred AS head_r, count(*) AS n_head
         |  FROM u GROUP BY 1),
         | hs AS (SELECT DISTINCT pred AS head_r, subj AS x FROM u),
         | pca AS (SELECT body.body_p, body.body_q, hs.head_r,
         |   count(*) AS n_body_pca FROM body
         |  JOIN hs ON body.x = hs.x GROUP BY 1, 2, 3),
         | sup AS (SELECT body.body_p, body.body_q, u.pred AS head_r,
         |   count(*) AS support FROM body
         |  JOIN u ON body.x = u.subj AND body.z = u.obj GROUP BY 1, 2, 3)
         | SELECT sup.body_p, sup.body_q, sup.head_r, nb.n_body,
         |  nh.n_head, sup.support,
         |  round(sup.support / nb.n_body, 4) AS confidence,
         |  pca.n_body_pca,
         |  round(sup.support / pca.n_body_pca, 4) AS pca_confidence,
         |  round(sup.support / nh.n_head, 4) AS head_coverage
         | FROM sup JOIN nb USING (body_p, body_q) JOIN nh USING (head_r)
         |  JOIN pca USING (body_p, body_q, head_r)
         | WHERE sup.support >= $RuleMinSupport
         |  AND round(sup.support / nb.n_body, 4) >= $RuleMinConf"""
        .stripMargin.replaceAll("\n", " "),
    // q113: the q112 mining CTEs re-gated at the acceptance floor, the
    // accepted rules' body groundings entailed as head facts, and the
    // asserted/inferred collapse on the full fact key
    "q113_rule_apply" ->
      s"""WITH dict(category, surface, entity_id) AS $AliasValues,
         | men AS MATERIALIZED (SELECT DISTINCT d.doc_id, dict.category,
         |   dict.entity_id FROM documents d CROSS JOIN dict
         |  WHERE position(surface in d.text) > 0),
         | tr AS MATERIALIZED (SELECT DISTINCT entity_id AS subj,
         |   $PredCase AS pred, 'doc://' || doc_id AS obj FROM men),
         | u AS MATERIALIZED (SELECT subj, pred, obj FROM tr
         |  UNION ALL
         |  SELECT DISTINCT a.entity_id, 'cooccurs_with', b.entity_id
         |  FROM men a JOIN men b ON a.doc_id = b.doc_id
         |   AND a.entity_id <> b.entity_id),
         | bd AS MATERIALIZED (SELECT DISTINCT a.pred AS body_p,
         |   b.pred AS body_q, a.subj AS x, b.obj AS z
         |  FROM u a JOIN u b ON a.obj = b.subj),
         | nb AS (SELECT body_p, body_q, count(*) AS n_body
         |  FROM bd GROUP BY 1, 2),
         | sup AS (SELECT bd.body_p, bd.body_q, u.pred AS head_r,
         |   count(*) AS support FROM bd
         |  JOIN u ON bd.x = u.subj AND bd.z = u.obj GROUP BY 1, 2, 3),
         | rules AS (SELECT sup.body_p, sup.body_q, sup.head_r
         |  FROM sup JOIN nb USING (body_p, body_q)
         |  WHERE sup.support >= $RuleMinSupport
         |   AND round(sup.support / nb.n_body, 4) >= $RuleApplyMinConf),
         | ent AS (SELECT bd.x AS subj, rules.head_r AS pred, bd.z AS obj
         |  FROM bd JOIN rules USING (body_p, body_q)),
         | allf AS (SELECT subj, pred, obj, 'a' AS src FROM u
         |  UNION ALL SELECT subj, pred, obj, 'i' FROM ent)
         | SELECT subj, pred, obj,
         |  CASE WHEN max(CASE WHEN src = 'a' THEN 1 ELSE 0 END) = 1
         |   THEN 'asserted' ELSE 'inferred' END AS provenance
         | FROM allf GROUP BY 1, 2, 3""".stripMargin.replaceAll("\n", " "),
    // q114: OPTIONAL = LEFT JOIN on the shared node; the in_lang leg
    // exists only where lang <> 'en', so lg null-fills for en pages
    "q114_bgp_optional" ->
      s"""WITH dict(category, surface, entity_id) AS $AliasValues,
         | tr AS (SELECT DISTINCT entity_id AS subj, $PredCase AS pred,
         |   'doc://' || d.doc_id AS obj
         |  FROM documents d CROSS JOIN dict
         |  WHERE position(surface in d.text) > 0),
         | meta AS (SELECT 'doc://' || doc_id AS subj, lang AS obj
         |  FROM documents WHERE lang <> 'en')
         | SELECT a.subj AS e, a.obj AS d, m.obj AS lg
         | FROM tr a LEFT JOIN meta m ON m.subj = a.obj
         | WHERE a.pred = 'performs'""".stripMargin.replaceAll("\n", " "),
    // q115: value-frequency ranking replayed with the identical window
    // ordering; rank cast to BIGINT on the engine side already
    "q115_entity_summary" ->
      s"""WITH dict(category, surface, entity_id) AS $AliasValues,
         | men AS MATERIALIZED (SELECT DISTINCT d.doc_id, dict.entity_id
         |  FROM documents d CROSS JOIN dict
         |  WHERE position(surface in d.text) > 0),
         | co AS MATERIALIZED (SELECT DISTINCT a.entity_id AS subj,
         |   'cooccurs_with' AS pred, b.entity_id AS obj
         |  FROM men a JOIN men b ON a.doc_id = b.doc_id
         |   AND a.entity_id <> b.entity_id),
         | po AS (SELECT pred, obj, count(*) AS n_po FROM co GROUP BY 1, 2)
         | SELECT subj, pred, obj, n_po, rank FROM (
         |  SELECT co.subj, co.pred, co.obj, po.n_po, row_number() OVER
         |   (PARTITION BY co.subj
         |    ORDER BY po.n_po ASC, co.pred ASC, co.obj ASC) AS rank
         |  FROM co JOIN po USING (pred, obj)) WHERE rank <= 3"""
        .stripMargin.replaceAll("\n", " "),
    // q116: bounded recursion with per-pair min(h) — the engine's
    // level-synchronous anti-join reaches each pair first at its
    // minimal depth, which is exactly min over all enumerated paths
    "q116_path_closure" ->
      s"""WITH RECURSIVE $CopurchaseEdgesCtes,
         | r(s, o, h) AS (SELECT u, v, 1 FROM e
         |  UNION
         |  SELECT r.s, e.v, r.h + 1 FROM r JOIN e ON r.o = e.u
         |  WHERE r.h < $Q116MaxHops)
         | SELECT s AS subj, o AS obj, CAST(min(h) AS BIGINT) AS hops
         | FROM r GROUP BY 1, 2""".stripMargin.replaceAll("\n", " "),
    // q117: the q61 cluster replay + fact re-grounding (bound-derived
    // variant in oracleSqlFor)
    "q117_sameas_collapse" -> sameAsSql(4096),
    // q118: planted-measurement extraction replay (bound-derived variant
    // in oracleSqlFor)
    "q118_measurements" -> measurementsSql(4096),
    // q119: SPARQL MINUS = NOT EXISTS on the shared variable; tr is
    // distinct, so required-side bag multiplicity is 1 per solution in
    // both engines
    "q119_bgp_minus" ->
      s"""WITH dict(category, surface, entity_id) AS $AliasValues,
         | tr AS (SELECT DISTINCT entity_id AS subj, $PredCase AS pred,
         |   'doc://' || d.doc_id AS obj
         |  FROM documents d CROSS JOIN dict
         |  WHERE position(surface in d.text) > 0),
         | meta AS (SELECT 'doc://' || doc_id AS subj FROM documents
         |  WHERE lang <> 'en')
         | SELECT a.subj AS e, a.obj AS d FROM tr a
         | WHERE a.pred = 'performs'
         |  AND NOT EXISTS (SELECT 1 FROM meta m WHERE m.subj = a.obj)"""
        .stripMargin.replaceAll("\n", " "),
    // q120: the simple-path unroll is generated from Q116MaxHops (the
    // same constant the engine lambda passes), then one left join flags
    // entailed edges
    "q120_transitive_reduction" ->
      s"""WITH $CopurchaseEdgesCtes,
         | ${transitiveReductionCtes(Q116MaxHops)}
         | SELECT e.u AS subj, 'copurchase' AS pred, e.v AS obj,
         |  (m.u IS NOT NULL) AS redundant
         | FROM e LEFT JOIN multi m ON m.u = e.u AND m.v = e.v"""
        .stripMargin.replaceAll("\n", " "),
    // q121: the quotient collapse — distinct facts, two left joins onto
    // the mention-derived type map, untyped-bucket coalesce, one
    // schema-keyed aggregate
    "q121_schema_graph" ->
      s"""WITH dict(category, surface, entity_id) AS $AliasValues,
         | men AS MATERIALIZED (SELECT DISTINCT d.doc_id, dict.category,
         |   dict.entity_id FROM documents d CROSS JOIN dict
         |  WHERE position(surface in d.text) > 0),
         | tr AS (SELECT DISTINCT entity_id AS subj, $PredCase AS pred,
         |   'doc://' || doc_id AS obj FROM men),
         | ty AS (SELECT DISTINCT entity_id AS node, category AS type
         |  FROM men)
         | SELECT coalesce(ts.type, 'untyped') AS subj_type, tr.pred,
         |  coalesce(tob.type, 'untyped') AS obj_type,
         |  count(*) AS n_facts, count(DISTINCT tr.subj) AS n_subj,
         |  count(DISTINCT tr.obj) AS n_obj
         | FROM tr LEFT JOIN ty ts ON ts.node = tr.subj
         | LEFT JOIN ty tob ON tob.node = tr.obj
         | GROUP BY 1, 2, 3""".stripMargin.replaceAll("\n", " "),
    // q122: held-out ranking replay (measured-cap variant in oracleSqlFor)
    "q122_linkpred_eval" -> linkPredEvalSql(LinkPredHubCapStatic),
    // q109: usage = the doc-level KG triples (the q100 equivalence) plus
    // co-occurrence facts, collapsed to distinct (subj, pred); votes are
    // exact scaled-integer micros (// is DuckDB integer division); the
    // sum is cast back from HUGEINT; ties break lexicographically
    "q109_type_by_usage" ->
      s"""WITH dict(category, surface, entity_id) AS $AliasValues,
         | men AS MATERIALIZED (SELECT DISTINCT d.doc_id, dict.category,
         |   dict.entity_id FROM documents d CROSS JOIN dict
         |  WHERE position(surface in d.text) > 0),
         | u AS MATERIALIZED (
         |  SELECT DISTINCT entity_id AS subj, $PredCase AS pred FROM men
         |  UNION
         |  SELECT DISTINCT a.entity_id, 'cooccurs_with' FROM men a
         |   JOIN men b ON a.doc_id = b.doc_id
         |    AND a.entity_id <> b.entity_id),
         | ty AS (SELECT DISTINCT entity_id, category FROM dict
         |  WHERE entity_id NOT IN $UsageHeldOutIn),
         | tu AS MATERIALIZED (SELECT u.subj, u.pred, ty.category
         |  FROM u JOIN ty ON u.subj = ty.entity_id),
         | np AS (SELECT pred, count(*) AS n_p FROM tu GROUP BY 1),
         | votes AS MATERIALIZED (SELECT v.pred, v.category AS type,
         |   (v.n_pt * 1000000) // np.n_p AS vote_micro
         |  FROM (SELECT pred, category, count(*) AS n_pt FROM tu
         |        GROUP BY 1, 2) v JOIN np USING (pred)),
         | unt AS MATERIALIZED (SELECT u.subj, u.pred FROM u
         |  LEFT JOIN ty ON u.subj = ty.entity_id
         |  WHERE ty.entity_id IS NULL),
         | sc AS (SELECT unt.subj, votes.type,
         |   CAST(sum(votes.vote_micro) AS BIGINT) AS score_micro
         |  FROM unt JOIN votes USING (pred) GROUP BY 1, 2),
         | npr AS (SELECT unt.subj, count(DISTINCT unt.pred) AS n_preds
         |  FROM unt JOIN votes USING (pred) GROUP BY 1),
         | rk AS (SELECT subj, type, score_micro, row_number() OVER
         |   (PARTITION BY subj ORDER BY score_micro DESC, type ASC) AS rn
         |  FROM sc)
         | SELECT rk.subj AS entity_id, rk.type AS inferred_type,
         |  npr.n_preds, rk.score_micro,
         |  round(rk.score_micro / (npr.n_preds * 1000000.0), 4)
         |   AS confidence
         | FROM rk JOIN npr USING (subj) WHERE rn = 1"""
        .stripMargin.replaceAll("\n", " "),
    // q110: the q80 recursive type closure feeds both the per-type
    // subject denominator and the per-(type, pred) numerator over ONE
    // distinct (subj, pred) collapse of the KG triples
    "q110_completeness" ->
      s"""WITH RECURSIVE dict(category, surface, entity_id) AS $AliasValues,
         | sub(c, p) AS $ClassHierarchyValues,
         | cl(c, p) AS (SELECT c, p FROM sub
         |   UNION SELECT cl.c, sub.p FROM cl JOIN sub ON cl.p = sub.c),
         | ent AS MATERIALIZED (SELECT DISTINCT entity_id, category
         |  FROM documents d CROSS JOIN dict
         |  WHERE position(surface in d.text) > 0),
         | ty AS MATERIALIZED (SELECT DISTINCT entity_id, type FROM (
         |  SELECT entity_id, category AS type FROM ent
         |  UNION ALL
         |  SELECT ent.entity_id, cl.p AS type FROM ent
         |   JOIN cl ON ent.category = cl.c)),
         | sp AS MATERIALIZED (SELECT DISTINCT entity_id AS subj,
         |   $PredCase AS pred FROM documents d CROSS JOIN dict
         |  WHERE position(surface in d.text) > 0),
         | denom AS (SELECT ty.type, count(*) AS n_entities
         |  FROM (SELECT DISTINCT subj FROM sp) s
         |  JOIN ty ON s.subj = ty.entity_id GROUP BY 1)
         | SELECT num.type, num.pred, denom.n_entities, num.n_with_pred,
         |  round(num.n_with_pred / denom.n_entities, 4) AS coverage
         | FROM (SELECT ty.type, sp.pred, count(*) AS n_with_pred
         |       FROM sp JOIN ty ON sp.subj = ty.entity_id
         |       GROUP BY 1, 2) num
         | JOIN denom USING (type)"""
        .stripMargin.replaceAll("\n", " "),
    // gap-sessionization replay: same (sec, event_id) tie order as q45;
    // session_idx cast to BIGINT (DuckDB sums to HUGEINT)
    "q76_sessionize" ->
      s"""WITH e AS (SELECT user_id, event_id,
         |   floor(epoch(ts::timestamp))::bigint AS sec FROM events),
         | m AS (SELECT user_id, event_id, sec,
         |   CASE WHEN lag(sec) OVER
         |       (PARTITION BY user_id ORDER BY sec, event_id) IS NULL
         |     OR sec - lag(sec) OVER
         |       (PARTITION BY user_id ORDER BY sec, event_id) > $SessionGapS
         |   THEN 1 ELSE 0 END AS is_start FROM e),
         | s AS (SELECT user_id, sec, (sum(is_start) OVER
         |     (PARTITION BY user_id ORDER BY sec, event_id))::bigint
         |     AS session_idx FROM m)
         | SELECT user_id, session_idx, count(*) AS n_events,
         |  min(sec) AS start_sec, max(sec) AS end_sec,
         |  max(sec) - min(sec) AS duration_s
         | FROM s GROUP BY user_id, session_idx"""
        .stripMargin.replaceAll("\n", " "),
    // N-Triples replay: escape chain with backslash FIRST (injective);
    // rt_ok asserted true — a parse defect on the engine side flips the
    // computed flag and breaks the hash
    "q77_ntriples_roundtrip" ->
      s"""WITH dict(category, surface, entity_id) AS $AliasValues,
         | tr AS (SELECT DISTINCT entity_id AS subj, $PredCase AS pred,
         |   'doc://' || d.doc_id AS obj
         |  FROM documents d CROSS JOIN dict WHERE position(surface in d.text) > 0)
         | SELECT subj, pred, obj,
         |  '<kg:' || subj || '> <kg:' || pred || '> "' ||
         |   replace(replace(replace(replace(replace(obj,
         |     '\\', '\\\\'), '"', '\\"'),
         |     chr(10), '\\n'), chr(13), '\\r'), chr(9), '\\t')
         |   || '" .' AS line,
         |  true AS rt_ok
         | FROM tr""".stripMargin.replaceAll("\n", " "),
    // functional-property audit replay over the same triple derivation
    "q78_functional_violations" ->
      s"""WITH dict(category, surface, entity_id) AS $AliasValues,
         | tr AS (SELECT DISTINCT entity_id AS subj, $PredCase AS pred,
         |   'doc://' || d.doc_id AS obj
         |  FROM documents d CROSS JOIN dict WHERE position(surface in d.text) > 0)
         | SELECT subj, pred, count(DISTINCT obj) AS n_obj,
         |  min(obj) AS obj_min, max(obj) AS obj_max
         | FROM tr WHERE pred IN ($FunctionalPredsSql)
         | GROUP BY subj, pred HAVING count(DISTINCT obj) >= 2"""
        .stripMargin.replaceAll("\n", " "),
    // sorted-neighborhood replay: one global row_number (fine at oracle
    // scale), rank-banded pairs via the fixed-bound generate_series
    // pattern, same least/greatest canonicalization
    "q79_er_match" ->
      s"""WITH recs AS (
         |  SELECT c_custkey * 2 AS rec_id, c_name AS key FROM customer
         |  UNION ALL
         |  SELECT c_custkey * 2 + 1 AS rec_id,
         |   CASE WHEN c_custkey % 2 = 0 THEN c_name || ' '
         |        ELSE c_name || right(c_name, 1) END AS key FROM customer),
         | rnk AS (SELECT rec_id, key,
         |   row_number() OVER (ORDER BY key, rec_id) AS rnk FROM recs),
         | pairs AS (SELECT a.rec_id AS id_a, a.key AS key_a,
         |   b.rec_id AS id_b, b.key AS key_b
         |  FROM rnk a CROSS JOIN generate_series(1, $ErWindow) g(j)
         |  JOIN rnk b ON b.rnk = a.rnk + g.j)
         | SELECT least(id_a, id_b) AS id_a, greatest(id_a, id_b) AS id_b,
         |  CASE WHEN id_a < id_b THEN key_a ELSE key_b END AS key_a,
         |  CASE WHEN id_a < id_b THEN key_b ELSE key_a END AS key_b,
         |  levenshtein(key_a, key_b) AS dist
         | FROM pairs WHERE levenshtein(key_a, key_b) <= $ErMaxDist"""
        .stripMargin.replaceAll("\n", " "),
    // closure replayed as a recursive CTE over the same declared edges;
    // instance set = the q69/q74 dict-position entity derivation
    "q80_type_closure" ->
      s"""WITH RECURSIVE dict(category, surface, entity_id) AS $AliasValues,
         | sub(c, p) AS $ClassHierarchyValues,
         | cl(c, p) AS (SELECT c, p FROM sub
         |   UNION SELECT cl.c, sub.p FROM cl JOIN sub ON cl.p = sub.c),
         | ent AS (SELECT DISTINCT entity_id, category FROM documents d
         |   CROSS JOIN dict WHERE position(surface in d.text) > 0)
         | SELECT DISTINCT entity_id, type FROM (
         |  SELECT entity_id, category AS type FROM ent
         |  UNION ALL
         |  SELECT ent.entity_id, cl.p AS type FROM ent
         |  JOIN cl ON ent.category = cl.c)""".stripMargin.replaceAll("\n", " "),
    "q81_star_bgp" ->
      s"""WITH dict(category, surface, entity_id) AS $AliasValues,
         | tr AS (SELECT DISTINCT entity_id AS subj, $PredCase AS pred,
         |   'doc://' || d.doc_id AS obj
         |  FROM documents d CROSS JOIN dict WHERE position(surface in d.text) > 0)
         | SELECT a.obj, a.subj AS subj_a, b.subj AS subj_b
         | FROM tr a JOIN tr b ON a.obj = b.obj
         | WHERE a.pred = 'uses_tool' AND b.pred = 'consumes'"""
        .stripMargin.replaceAll("\n", " "),
    // the doc_id%3 snapshot split replayed exactly; FULL JOIN on the
    // triple key → kept/added/removed
    "q82_snapshot_diff" ->
      s"""WITH dict(category, surface, entity_id) AS $AliasValues,
         | tr AS (SELECT DISTINCT entity_id AS subj, $PredCase AS pred,
         |   'doc://' || d.doc_id AS obj, d.doc_id AS did
         |  FROM documents d CROSS JOIN dict WHERE position(surface in d.text) > 0),
         | a AS (SELECT subj, pred, obj FROM tr WHERE did % 3 != 0),
         | b AS (SELECT subj, pred, obj FROM tr WHERE did % 3 != 1)
         | SELECT coalesce(a.subj, b.subj) AS subj,
         |  coalesce(a.pred, b.pred) AS pred, coalesce(a.obj, b.obj) AS obj,
         |  CASE WHEN a.subj IS NOT NULL AND b.subj IS NOT NULL THEN 'kept'
         |   WHEN b.subj IS NOT NULL THEN 'added' ELSE 'removed' END AS status
         | FROM a FULL JOIN b
         | ON a.subj = b.subj AND a.pred = b.pred AND a.obj = b.obj"""
        .stripMargin.replaceAll("\n", " "),
    // first mention = first occurrence (position) — the engine's
    // min-span over grounded mentions; contexts sliced with the same
    // 1-based substr arithmetic
    "q83_relation_contexts" ->
      s"""WITH dict(category, surface, entity_id) AS $AliasValues,
         | m AS (SELECT d.doc_id, entity_id,
         |   (position(surface IN d.text) - 1)::int AS b,
         |   (position(surface IN d.text) - 1 + length(surface))::int AS e
         |  FROM documents d CROSS JOIN dict WHERE position(surface in d.text) > 0),
         | p AS (SELECT a.doc_id, a.entity_id AS e1, b.entity_id AS e2,
         |   a.e AS end1, b.b AS b2
         |  FROM m a JOIN m b ON a.doc_id = b.doc_id
         |   AND a.entity_id != b.entity_id
         |   AND b.b >= a.e AND b.b - a.e <= $RelCtxMaxGap)
         | SELECT e1, e2, trim(substr(d.text, end1 + 1, b2 - end1)) AS context,
         |  count(*) AS n_pairs
         | FROM p JOIN documents d ON p.doc_id = d.doc_id
         | GROUP BY 1, 2, 3""".stripMargin.replaceAll("\n", " "),
    // mention count replayed with the replace trick (replace is
    // non-overlapping left-to-right — identical to the grounding
    // pass's find-resume semantics)
    "q84_entity_salience" ->
      s"""WITH dict(category, surface, entity_id) AS $AliasValues
         | SELECT d.doc_id, entity_id,
         |  ((length(text) - length(replace(text, surface, '')))
         |    / length(surface))::bigint AS n_mentions,
         |  (position(surface IN text) - 1)::int AS first_pos,
         |  round(((length(text) - length(replace(text, surface, '')))
         |     / length(surface)) / length(string_split_regex(trim(text), '\\s+'))
         |   + (1 - (position(surface IN text) - 1) / length(text)::double), 4)
         |   AS salience
         | FROM documents d CROSS JOIN dict
         | WHERE position(surface in d.text) > 0"""
        .stripMargin.replaceAll("\n", " "),
    "q85_triple_temporal" ->
      s"""WITH dict(category, surface, entity_id) AS $AliasValues,
         | tr AS (SELECT DISTINCT entity_id AS subj, $PredCase AS pred,
         |   'doc://' || d.doc_id AS obj, d.doc_id AS did
         |  FROM documents d CROSS JOIN dict WHERE position(surface in d.text) > 0),
         | w AS (SELECT subj, pred, $CrawlEpochBase + did * 3600 AS ts_s FROM tr)
         | SELECT subj, pred, count(*) AS n_obs, min(ts_s) AS first_seen_s,
         |  max(ts_s) AS last_seen_s, max(ts_s) - min(ts_s) AS span_s
         | FROM w GROUP BY 1, 2""".stripMargin.replaceAll("\n", " "),
    "q86_random_walks" ->
      graft.kg.RandomWalks.oracleSql(KCoreEdgesSql, WalksPerNode, WalkSteps),
    "q87_entity_embeddings" ->
      s"""WITH dict(category, surface, entity_id) AS $AliasValues,
         | ent AS (SELECT DISTINCT d.doc_id, entity_id FROM documents d
         |   CROSS JOIN dict WHERE position(surface in d.text) > 0),
         | x AS (SELECT entity_id, g.j - 1 AS j, e.embedding[g.j]::double AS v
         |  FROM ent JOIN embeddings e ON e.vec_id = ent.doc_id
         |  CROSS JOIN generate_series(1, 64) g(j))
         | SELECT entity_id, j::int AS j, round(avg(v), 4) AS v
         | FROM x GROUP BY 1, 2""".stripMargin.replaceAll("\n", " "),
    // SimHash replay: md5_number_lower == the engine's md5Hash64 (lower 8
    // MD5 bytes, little-endian); fingerprint compared as a 64-char bit
    // string, MSB first
    "q16_simhash" ->
      """WITH toks AS (SELECT doc_id,
        |   unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents),
        | tc AS (SELECT doc_id, tok, count(*) AS n FROM toks GROUP BY doc_id, tok),
        | th AS (SELECT doc_id, md5_number_lower(tok) AS h, n FROM tc),
        | bits AS (SELECT doc_id, g.b AS b,
        |   sum(CASE WHEN (h >> g.b) & 1 = 1 THEN n ELSE -n END) AS acc
        |  FROM th CROSS JOIN generate_series(0, 63) g(b) GROUP BY doc_id, g.b)
        | SELECT doc_id,
        |  string_agg(CASE WHEN acc > 0 THEN '1' ELSE '0' END, '' ORDER BY b DESC)
        |    AS simhash_bits
        | FROM bits GROUP BY doc_id""".stripMargin.replaceAll("\n", " "),
    "q45_asof_attribution" ->
      """WITH e AS (SELECT event_id, user_id,
        |   floor(epoch(ts::timestamp))::bigint AS sec, event_type FROM events),
        | w AS (SELECT event_id, user_id, sec, event_type,
        |   last_value(CASE WHEN event_type = 'click' THEN sec END IGNORE NULLS)
        |     OVER (PARTITION BY user_id ORDER BY sec, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |     AS prev_click_sec
        |  FROM e)
        | SELECT event_id, user_id, sec, prev_click_sec,
        |  sec - prev_click_sec AS gap_s
        | FROM w WHERE event_type = 'error'"""
        .stripMargin.replaceAll("\n", " "),
    // interval-join replay: the binning is a plan-level rewrite, not a
    // semantic one — the oracle states the plain point-in-range join
    "q58_interval_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |   floor(epoch(ts::timestamp))::bigint AS sec FROM events),
        | g AS (SELECT user_id, event_id, sec,
        |   CASE WHEN lag(sec) OVER w IS NULL OR sec - lag(sec) OVER w > 200000
        |        THEN 1 ELSE 0 END AS isnew
        |  FROM e WHERE event_type = 'click'
        |  WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
        | sidx AS (SELECT user_id, sec,
        |   sum(isnew) OVER (PARTITION BY user_id ORDER BY sec, event_id
        |                    ROWS UNBOUNDED PRECEDING) AS session_idx FROM g),
        | sess AS (SELECT user_id, session_idx::bigint AS session_idx,
        |   min(sec) AS s_start, max(sec) AS s_end
        |  FROM sidx GROUP BY 1, 2)
        | SELECT err.event_id, err.user_id, err.sec AS err_sec,
        |  sess.session_idx, sess.s_start, sess.s_end
        | FROM (SELECT event_id, user_id, sec FROM e
        |       WHERE event_type = 'error') err
        | JOIN sess ON err.user_id = sess.user_id
        |  AND err.sec BETWEEN sess.s_start AND sess.s_end"""
        .stripMargin.replaceAll("\n", " "),
    "q40_sessionize" ->
      """WITH e AS (SELECT user_id, event_id,
        |   floor(epoch(ts::timestamp))::bigint AS sec FROM events),
        | g AS (SELECT user_id, event_id, sec,
        |   CASE WHEN lag(sec) OVER w IS NULL OR sec - lag(sec) OVER w > 1800
        |        THEN 1 ELSE 0 END AS isnew
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
        | s AS (SELECT user_id, sec,
        |   sum(isnew) OVER (PARTITION BY user_id ORDER BY sec, event_id
        |                    ROWS UNBOUNDED PRECEDING) AS session_idx FROM g)
        | SELECT user_id, session_idx::bigint AS session_idx,
        |  count(*)::bigint AS n_events,
        |  (max(sec) - min(sec))::bigint AS duration_s
        | FROM s GROUP BY user_id, session_idx"""
        .stripMargin.replaceAll("\n", " "),
    "q38_bpe_tokens" -> (
      "SELECT doc_id, len(regexp_extract_all(text, '" +
        graft.quality.TextQuality.BpePattern.replace("'", "''") +
        "'))::int AS n_bpe FROM documents"),
    "q36_wav_meta" ->
      """SELECT doc_id AS id, 8000::int AS sample_rate, 1::int AS channels,
        | 16::int AS bits,
        | ((4 * (2 + doc_id % 6)) * (50 + doc_id % 50))::bigint AS n_frames,
        | (1000 + (doc_id % 20) * 500)::int AS peak
        | FROM documents""".stripMargin.replaceAll("\n", " "),
    "q37_video_frames" ->
      """SELECT doc_id AS id, g.j::int AS frame_idx,
        | (16 + (doc_id % 4) * 16)::int AS width, 16::int AS height,
        | ((doc_id * 37 + g.j * 11) % 256)::double AS mean_r
        | FROM documents JOIN generate_series(0, 4, 2) g(j)
        |   ON g.j < 2 + doc_id % 5""".stripMargin.replaceAll("\n", " "))
    // Only q20_kg_pipeline and q39_warc_roundtrip lack oracles — both
    // self-synthesize their input (no sf table for DuckDB to read), by
    // design; each is pinned by specs (pipeline P/R + resume byte-identity;
    // WARC byte round-trip + pipeline parity) and a per-row ok flag.

  /** Oracle rows whose SQL depends on the DATA, built per sfDir (Verify
    * dumps this superset): q42's k-means centroids are a deterministic
    * function of the embeddings table, so the SQL embeds the centroids
    * trained on THAT table and replays assignment → probe → re-rank; and
    * every fixed-bound position-scan oracle gets its series bound derived
    * from the table's own maxima (+small slack), so the gate cannot
    * silently under-count if fixtures grow. */
  def oracleSqlFor(spark: SparkSession, sfDir: String): Map[String, String] = {
    val m = t(spark, sfDir, "documents").agg(
      max(length(col("text"))),
      max(octet_length(col("text"))),
      max(size(split(trim(col("text")), "\\s+")))).head()
    // max() over zero rows is null — fall back to the former static bounds
    // rather than NPE-ing the whole verify dump on an empty table
    def bound(i: Int, default: Long): Long =
      if (m.isNullAt(i)) default else m.getInt(i).toLong
    val maxLen = bound(0, 32768L)
    val maxBytes = bound(1, 262144L)
    val maxToks = bound(2, 4096L)
    val derived = Map(
      "q10_ner_mentions" -> nerMentionsSql(maxLen + 1),
      "q26_ner_batched" -> nerMentionsSql(maxLen + 1),
      "q44_find_all_native" -> findAllSql(maxLen + 1),
      "q21_langid" -> langidSql(maxLen + 4),
      "q25_frame_sample" -> frameSampleSql(maxBytes / 64 + 2),
      "q15_minhash_pairs" -> minhashSql(maxToks + 1),
      "q61_neardup_clusters" -> clustersSql(maxToks + 1),
      "q117_sameas_collapse" -> sameAsSql(maxToks + 1),
      // every measurement mention spans ≥ 2 chars, so matches per doc are
      // bounded by half the (planted-suffix-padded) text length
      "q118_measurements" -> measurementsSql(maxLen / 2 + 32),
      "q62_line_dedup" -> lineDedupSql(maxToks / 3 + 2),
      "q63_line_dedup_strip" -> lineStripSql(maxToks / 3 + 2),
      "q64_delta_dedup" -> deltaSql(maxToks + 1),
      // k-core's peel depth is data-dependent: unroll the engine-measured
      // round count (+1 slack; extra rounds are idempotent, fewer are not).
      // The query run records its depth in KCoreRoundsMemo; re-peel only
      // if the oracle is generated before the query ever ran.
      "q73_kcore" -> {
        val rounds = KCoreRoundsMemo.getOrElseUpdate(sfDir,
          graft.kg.KCore.coreWithRounds(spark,
            partsCooccurEdges(spark, sfDir), KCoreK)._2)
        graft.kg.KCore.oracleSql(KCoreEdgesSql, KCoreK, rounds + 1)
      },
      // q148: the truss peel is data-dependent like q73 — unroll the
      // engine-measured round count (+1 idempotent slack)
      "q148_ktruss" -> {
        val rounds = KTrussRoundsMemo.getOrElseUpdate(sfDir,
          graft.kg.KTruss.trussWithRounds(spark,
            mod5CooccurPairs(spark, sfDir), KTrussK)._2)
        graft.kg.KTruss.oracleSql(Mod5CooccurSql, KTrussK, rounds + 1)
      },
      // q171: Luby rounds are data-dependent — unroll the measured
      // count (+1 idempotent slack: an empty winner round is a no-op)
      "q171_mis" -> {
        val rounds = MisRoundsMemo.getOrElseUpdate(sfDir,
          graft.kg.Mis.misWithRounds(spark,
            landmarkEdges(spark, sfDir))._2)
        graft.kg.Mis.oracleSql(LandmarkCanonSql, rounds + 1)
      },
      // q175: the s-core peel depth, measured like q73's
      "q175_score" -> {
        val rounds = SCoreRoundsMemo.getOrElseUpdate(sfDir,
          graft.kg.KCore.strengthCoreWithRounds(spark,
            weightedLandmarkEdges(spark, sfDir), SCoreS)._2)
        graft.kg.KCore.strengthOracleSql(WeightedLandmarkEdgesSql,
          SCoreS, rounds + 1)
      },
      // q75's cap is the engine-measured p75 degree percentile — reuse the
      // query run's memo, or measure here if the oracle is generated first
      "q75_link_predict" -> linkPredSql(
        LinkPredCapMemo.getOrElseUpdate(sfDir,
          graft.kg.LinkPredict.measuredHubCap(
            partsCooccurEdges(spark, sfDir), LinkPredHubPct))),
      // q122 shares q75's measured-cap memo: the eval ranks candidates
      // under the SAME data-relative hub cap the proposal query uses
      "q122_linkpred_eval" -> linkPredEvalSql(
        LinkPredCapMemo.getOrElseUpdate(sfDir,
          graft.kg.LinkPredict.measuredHubCap(
            partsCooccurEdges(spark, sfDir), LinkPredHubPct))),
      "q90_bigram_logprob" -> bigramSql(maxToks + 1),
      "q141_textrank" -> graft.kg.PageRank.oracleSql(
        graft.quality.TextRank.edgesSql(maxToks + 1), 10),
      // q95's bucket cutpoints are the engine's own percentile output,
      // inlined as literals — the q42 trained-centroids pattern; the memo
      // guarantees these are the exact values the query run binned with
      "q95_perplexity_buckets" -> graft.quality.LmScore.bucketsOracleSql(
        PerplexityCutsMemo.getOrElseUpdate(sfDir,
          graft.quality.LmScore.scoreCutpoints(
            t(spark, sfDir, "documents"), 10))),
      // q104's weights are the ENGINE's micro-log-odds longs inlined as a
      // CASE — the only transcendental (ln) runs once, engine-side; every
      // oracle-side sum and comparison is exact integer arithmetic
      "q104_weighted_fusion" -> {
        val w = q104Weights(spark, sfDir)
        val wCase = (0 until Q104Sources)
          .map(k => s"WHEN $k THEN ${w.getOrElse(k.toString, 0L)}")
          .mkString("CASE source ", " ", " ELSE 0 END")
        s"""WITH src AS (
           | SELECT 's_' || s_suppkey AS subj, 'in_nation' AS pred,
           |  'n_' || (CASE WHEN g.k <= 1 AND s_suppkey % $Q104PairMod = 0
           |    THEN (s_nationkey + 1) % 25
           |   WHEN g.k = 2 AND s_suppkey % $Q104SoloMod = 0
           |    THEN (s_nationkey + 2) % 25
           |   ELSE s_nationkey END) AS obj,
           |  g.k AS source
           | FROM supplier CROSS JOIN generate_series(0, ${Q104Sources - 1}) g(k)),
           | votes AS (SELECT DISTINCT subj, pred, obj, source FROM src),
           | scored AS (SELECT subj, pred, obj, count(*) AS n_votes,
           |   (sum($wCase))::bigint AS score_micro
           |  FROM votes GROUP BY 1, 2, 3),
           | ranked AS (SELECT subj, pred, obj, n_votes, score_micro,
           |   row_number() OVER (PARTITION BY subj, pred
           |     ORDER BY score_micro DESC, obj ASC) AS rn,
           |   first_value(obj) OVER (PARTITION BY subj, pred
           |     ORDER BY n_votes DESC, obj ASC) AS vote_winner
           |  FROM scored)
           | SELECT subj, pred, obj, n_votes, score_micro,
           |  obj != vote_winner AS flipped
           | FROM ranked WHERE rn = 1""".stripMargin.replaceAll("\n", " ")
      })
    val cent = graft.sim.Ivf.centroidsFor(
      spark, t(spark, sfDir, "embeddings"), 16, 5, 100000)
    oracleSql ++ derived + ("q42_ann_ivf" -> (
      s"""WITH cent(cell, c) AS ${graft.sim.Ivf.centroidValues(cent)},
        | a AS (SELECT vec_id, embedding, cell FROM (
        |   SELECT e.vec_id, e.embedding, c.cell,
        |    row_number() OVER (PARTITION BY e.vec_id
        |      ORDER BY list_distance(e.embedding::DOUBLE[], c.c), c.cell) AS rn
        |   FROM embeddings e CROSS JOIN cent c) t WHERE rn = 1),
        | q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        | qc AS (SELECT c.cell FROM cent c CROSS JOIN q
        |        ORDER BY list_distance(q.qe::DOUBLE[], c.c), c.cell LIMIT 2)
        | SELECT vec_id, round(sim, 4) AS sim FROM (
        |  SELECT a.vec_id,
        |   list_cosine_similarity(a.embedding::DOUBLE[], q.qe::DOUBLE[]) AS sim
        |  FROM a JOIN qc ON a.cell = qc.cell CROSS JOIN q
        |  ORDER BY sim DESC, a.vec_id LIMIT 10) t"""
        .stripMargin.replaceAll("\n", " ")))
  }
}
