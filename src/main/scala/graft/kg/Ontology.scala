package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ontology-constraint hygiene over an extracted triple set. A
  * KG-construction pipeline that merges LLM-extracted triples from
  * millions of pages accumulates constraint violations the extractor
  * can't see locally; the standard post-merge audit (OWL
  * `FunctionalProperty` / SHACL `sh:maxCount 1`) finds subjects that
  * carry MORE than one object for a predicate declared single-valued.
  *
  * Scale shape: one map-side-combined aggregation keyed by (subj, pred)
  * after a predicate-whitelist filter that prunes the scan — the
  * violation report is bounded by the violating-subject count, never the
  * triple count. The offending objects are surfaced as min/max plus the
  * full count (not a collect_list) so a pathological subject with
  * millions of objects costs two comparisons per row, not an array
  * buffer.
  */
object Ontology {

  /** Subjects violating functional predicates:
    * `(subj, pred, n_obj, obj_min, obj_max)` with `n_obj >= 2`.
    *
    * @param triples         `(subj, pred, obj)` rows (duplicates allowed —
    *                        multiplicity is counted over DISTINCT objects)
    * @param functionalPreds predicates declared single-valued
    */
  def functionalViolations(triples: DataFrame,
      functionalPreds: Seq[String]): DataFrame =
    triples
      .filter(col("pred").isin(functionalPreds: _*))
      .groupBy(col("subj"), col("pred"))
      .agg(
        count_distinct(col("obj")).as("n_obj"),
        min(col("obj")).as("obj_min"),
        max(col("obj")).as("obj_max"))
      .filter(col("n_obj") >= 2)

  /** RDFS/SHACL domain audit: subjects using a predicate whose DECLARED
    * domain class is absent from the subject's inferred type set
    * (`rdfs:domain` checking, SHACL `sh:class` on the subject shape) —
    * the modeling-error detector run after [[inferTypes]] materializes
    * the closure. A clean extraction pipeline yields zero rows; a
    * predicate declared against the wrong branch of the hierarchy
    * surfaces ALL its subjects here, which is exactly how ontology
    * drift between extraction prompts and the declared schema is caught.
    *
    * Scale shape: triples aggregate once by (subj, pred) — map-side
    * combined, bounded by the distinct pair count — then a broadcast
    * join attaches the declared domain (declaration-sized metadata) and
    * a LEFT ANTI join against the type table (entity-vocabulary-sized)
    * keeps only subjects missing the required type. Nothing corpus-sized
    * is ever on the build side.
    *
    * @param triples `(subj, pred, obj)` extracted triples
    * @param types   `(entity_id, type)` — [[inferTypes]]' output
    * @param domains declared `pred → required class`
    * @return `(subj, pred, required_type, n_triples)` violations */
  def domainViolations(spark: SparkSession, triples: DataFrame,
      types: DataFrame, domains: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    val decl = domains.toDF("pred", "required_type")
    triples.groupBy(col("subj"), col("pred"))
      .agg(count(lit(1)).as("n_triples"))
      .join(broadcast(decl), "pred")
      .join(types.select(col("entity_id").as("subj"),
          col("type").as("required_type")),
        Seq("subj", "required_type"), "left_anti")
      .select(col("subj"), col("pred"), col("required_type"), col("n_triples"))
  }

  /** SHACL-lite cardinality-shape validation — the general-`k` form of
    * [[functionalViolations]]' `maxCount 1` special case (SHACL
    * `sh:minCount`/`sh:maxCount` on a property shape, W3C SHACL §4.2):
    * for every entity of a shaped type, the distinct-object count of
    * each shaped predicate must land in `[min_count, max_count]`.
    * Unlike the functional audit, a MIN violation is visible only from
    * the ABSENCE of facts — an entity with zero facts of a required
    * predicate never appears in the triple stream at all — so the check
    * anchors on the typed-entity table and LEFT-joins the fact counts,
    * defaulting the missing count to 0 (the "every person needs a birth
    * date" completeness gate that a triple-side scan cannot express).
    *
    * @param triples `(subj, pred, obj)` facts (duplicates fine —
    *                multiplicity counts DISTINCT objects, matching
    *                [[functionalViolations]])
    * @param types   functional `(entity_id, type)` map of shaped
    *                entities
    * @param shapes  declared `(type, pred, min_count, max_count)` rows —
    *                schema-sized metadata, always broadcast
    * @return violations only:
    *         `(subj, subj_type, pred, n_obj, min_count, max_count,
    *         kind)` with `kind ∈ {min, max}`
    *
    * Scale shape: ONE distinct-fact collapse feeds a map-side-combined
    * `(subj, pred)` count; the shape table broadcasts onto the
    * entity-vocabulary-sized type table (per-entity fan-out = shapes
    * declared on its type, schema-bounded); the candidate×count meet is
    * a subject-keyed left equi-join AQE broadcasts when the surviving
    * side measures small. Output is violation-bounded, never
    * triple-bounded. */
  def shapeViolations(spark: SparkSession, triples: DataFrame,
      types: DataFrame, shapes: Seq[(String, String, Long, Long)]): DataFrame = {
    import spark.implicits._
    require(shapes.forall { case (_, _, lo, hi) => lo >= 0 && lo <= hi },
      "each shape needs 0 <= min_count <= max_count")
    val sh = shapes.toDF("subj_type", "pred", "min_count", "max_count")
    val counts = triples.select("subj", "pred", "obj").distinct()
      .groupBy("subj", "pred")
      .agg(count(lit(1)).as("n_obj"))
    types.select(col("entity_id").as("subj"), col("type").as("subj_type"))
      .join(broadcast(sh), "subj_type")
      .join(counts, Seq("subj", "pred"), "left")
      .withColumn("n_obj", coalesce(col("n_obj"), lit(0L)))
      .withColumn("kind",
        when(col("n_obj") < col("min_count"), "min")
          .when(col("n_obj") > col("max_count"), "max"))
      .filter(col("kind").isNotNull)
      .select(col("subj"), col("subj_type"), col("pred"), col("n_obj"),
        col("min_count"), col("max_count"), col("kind"))
  }

  /** Cardinality-shape INDUCTION — the discovery complement of
    * [[shapeViolations]]' declared audit (SHACL shape mining: learn the
    * `sh:minCount`/`sh:maxCount` a curator would declare from what the
    * data already exhibits — the per-(class, property) cardinality
    * profiling step of shape-induction systems like SheXer/shaclgen).
    * Per `(type, pred)` observed on typed subjects: how many subjects
    * carry the predicate, the min/max/mean distinct-object count — the
    * observed envelope `[cnt_min, cnt_max]` IS the candidate shape, and
    * the mean (an exact scaled-integer micro, the q104 determinism
    * pattern) says where in the envelope the mass sits. Read next to
    * [[completenessProfile]] (how many subjects LACK the predicate
    * entirely) these two decide whether the induced minCount should be
    * 0 or the observed floor.
    *
    * @param triples `(subj, pred, obj)` facts (duplicates fine —
    *                distinct objects counted, matching the audit)
    * @param types   functional `(entity_id, type)` map
    * @return `(subj_type, pred, n_subjects, cnt_min, cnt_max,
    *         mean_cnt_micro)`
    *
    * Scale shape: ONE distinct-fact collapse feeds a map-side-combined
    * `(subj, pred)` count; the type table joins on subject
    * (entity-vocabulary-sized, AQE broadcasts when small) and the final
    * aggregate is schema-sized — |types| × |preds| rows out. */
  def induceShapes(triples: DataFrame, types: DataFrame): DataFrame =
    triples.select("subj", "pred", "obj").distinct()
      .groupBy("subj", "pred")
      .agg(count(lit(1)).as("n_obj"))
      .join(types.select(col("entity_id").as("subj"),
        col("type").as("subj_type")), "subj")
      .groupBy("subj_type", "pred")
      .agg(
        count(lit(1)).as("n_subjects"),
        min(col("n_obj")).as("cnt_min"),
        max(col("n_obj")).as("cnt_max"),
        expr("(sum(n_obj) * 1000000L) div count(1)").as("mean_cnt_micro"))

  /** PARIS-style predicate alignment between two extractor vocabularies
    * (Suchanek/Abiteboul/Senellart, VLDB 2012 — the probabilistic
    * ontology-alignment system; we compute its set-overlap evidence in
    * its symmetric Jaccard form). Two extraction runs over the same
    * corpus — different prompt versions, different upstream models —
    * emit the same FACTS under different predicate names; alignment
    * recovers the rename map from shared `(subj, obj)` evidence alone,
    * with no string similarity on the names: predicates `pa` and `pb`
    * align when the instance sets `{(s,o) : (s,pa,o) ∈ A}` and
    * `{(s,o) : (s,pb,o) ∈ B}` overlap.
    *
    * Returns every co-occurring pair
    * `(pred_a, pred_b, n_a, n_b, n_both, jaccard)` — thresholding is the
    * consumer's decision, so the operator stays measurement-only.
    *
    * Scale shape: each side collapses to distinct fact triples (one
    * exchange keyed by the full triple, map-side combined); the equi-join
    * on `(subj, obj)` is partitioned by the fact key and its output
    * aggregates map-side down to at most |vocab_a|·|vocab_b| rows; the
    * per-predicate totals are vocabulary-sized relations broadcast onto
    * the pair counts. Nothing corpus-sized crosses the network twice.
    *
    * @param a `(subj, pred, obj)` triples from extractor A
    * @param b `(subj, pred, obj)` triples from extractor B
    */
  def alignPredicates(a: DataFrame, b: DataFrame): DataFrame =
    alignDistinct(distinctFacts(a), distinctFacts(b))

  /** The corpus-sized distinct-fact collapse every alignment consumer
    * shares. Deliberately NOT persisted: each operator here is a single
    * action, and building the collapse ONCE per side makes the consumer
    * subtrees byte-identical, so Spark's exchange reuse shares the
    * shuffle files at runtime for free — measured 0.4–0.9 s FASTER at
    * sf0.1 than forcing the rows through the block manager with
    * `persist` (which pays materialization + deserialization and blocks
    * nothing that reuse doesn't already cover). Persist remains right
    * for ITERATIVE graph ops ([[Triangles]], [[Bfs]]) where lineage
    * would otherwise grow per round — not for DAG-shared leaves. */
  private def distinctFacts(t: DataFrame): DataFrame =
    t.select("subj", "pred", "obj").distinct()

  /** [[alignPredicates]] over already-collapsed fact sets. */
  private def alignDistinct(da: DataFrame, db: DataFrame): DataFrame = {
    val na = da.groupBy(col("pred").as("pred_a")).agg(count(lit(1)).as("n_a"))
    val nb = db.groupBy(col("pred").as("pred_b")).agg(count(lit(1)).as("n_b"))
    da.as("a").join(db.as("b"), Seq("subj", "obj"))
      .groupBy(col("a.pred").as("pred_a"), col("b.pred").as("pred_b"))
      .agg(count(lit(1)).as("n_both"))
      .join(broadcast(na), "pred_a")
      .join(broadcast(nb), "pred_b")
      .select(col("pred_a"), col("pred_b"), col("n_a"), col("n_b"),
        col("n_both"),
        round(col("n_both") / (col("n_a") + col("n_b") - col("n_both")), 4)
          .as("jaccard"))
  }

  /** Inverse-predicate detection — the orientation half of PARIS-style
    * alignment ([[alignPredicates]] recovers renames; this recovers
    * REVERSALS). Two extraction prompts routinely emit the same relation
    * in opposite orientations (`authored` vs `authored_by`); the evidence
    * is again purely instance-level: predicates `p` and `q` are inverse
    * candidates when the fact set `{(s,o) : (s,p,o)}` overlaps the
    * REVERSED set `{(o,s) : (s,q,o)}`. The diagonal `p = q` row is the
    * symmetric-predicate detector (OWL `SymmetricProperty` discovery): a
    * predicate whose facts mirror themselves scores jaccard 1.0 against
    * its own reversal.
    *
    * Returns every co-occurring ordered pair
    * `(pred_a, pred_b, n_a, n_b, n_both, jaccard)` where `n_both` counts
    * facts of `pred_a` whose reversal is asserted under `pred_b` —
    * measurement-only, like [[alignPredicates]]; thresholding and the
    * rewrite (flip `pred_b` facts through [[mergeAligned]]'s rename
    * machinery after reversing them) stay with the consumer.
    *
    * Scale shape: ONE distinct-fact collapse feeds both join legs as
    * byte-identical subtrees (exchange reuse — see [[distinctFacts]]),
    * the self-join keys on the full `(subj, obj)` fact pair (unique per
    * predicate per side, so per-key fan-out is bounded by the predicate
    * vocabulary, never corpus-sized), and the per-predicate totals are
    * vocabulary-sized broadcast legs.
    */
  def inversePairs(triples: DataFrame): DataFrame =
    inversePairsDistinct(distinctFacts(triples))

  /** [[inversePairs]] over an already-collapsed fact set — shared with
    * [[enrichInverses]] so the detection and the enrichment consume ONE
    * distinct collapse (byte-identical subtrees → exchange reuse). */
  private def inversePairsDistinct(d: DataFrame): DataFrame = {
    val na = d.groupBy(col("pred").as("pred_a")).agg(count(lit(1)).as("n_a"))
    val nb = d.groupBy(col("pred").as("pred_b")).agg(count(lit(1)).as("n_b"))
    d.as("x")
      .join(d.as("y"),
        col("x.subj") === col("y.obj") && col("x.obj") === col("y.subj"))
      .groupBy(col("x.pred").as("pred_a"), col("y.pred").as("pred_b"))
      .agg(count(lit(1)).as("n_both"))
      .join(broadcast(na), "pred_a")
      .join(broadcast(nb), "pred_b")
      .select(col("pred_a"), col("pred_b"), col("n_a"), col("n_b"),
        col("n_both"),
        round(col("n_both") / (col("n_a") + col("n_b") - col("n_both")), 4)
          .as("jaccard"))
  }

  /** The ACTION on [[inversePairs]]' measurement: materialize the OWL
    * `inverseOf` / `SymmetricProperty` consequences. For every detected
    * pair `(p, q)` at or above `minJaccard`, each asserted fact
    * `(s, q, o)` entails `(o, p, s)`; the entailed facts the KG does not
    * already assert are added with provenance `inferred`, everything
    * asserted keeps provenance `asserted`. Diagonal pairs `(p, p)` are
    * the symmetric case and enrich identically (a fact whose mirror is
    * missing gains it). This is the standard rule-materialization step
    * (RDFS/OWL-RL forward chaining, `owl:inverseOf`) that makes the
    * downstream BGP queries ([[graft.kg.TriplePatterns]]) see a fact
    * regardless of which orientation the extractor happened to emit.
    *
    * @return `(subj, pred, obj, provenance)` — the enriched KG; distinct
    *         by construction.
    *
    * Scale shape: ONE distinct-fact collapse feeds the detection's three
    * legs AND the enrichment's two union legs (byte-identical subtrees →
    * exchange reuse); the surviving pair map is vocabulary-sized and
    * broadcast onto the fact stream (narrow reversal); the only new
    * corpus-sized exchange is the final provenance collapse, map-side
    * combined on the full fact key. */
  def enrichInverses(triples: DataFrame, minJaccard: Double): DataFrame = {
    val d = distinctFacts(triples)
    val pairs = inversePairsDistinct(d)
      .filter(col("jaccard") >= minJaccard)
      .select(col("pred_a"), col("pred_b"))
    val entailed = d
      .join(broadcast(pairs), d("pred") === col("pred_b"))
      .select(col("obj").as("subj"), col("pred_a").as("pred"),
        col("subj").as("obj"), lit("i").as("src"))
    d.withColumn("src", lit("a"))
      .unionByName(entailed)
      .groupBy("subj", "pred", "obj")
      .agg(when(max(when(col("src") === "a", 1).otherwise(0)) === 1,
        "asserted").otherwise("inferred").as("provenance"))
  }

  /** Usage-based type inference for UNTYPED entities — the SDType method
    * (Paulheim & Bizer, "Type Inference on Noisy RDF Data", ISWC 2013):
    * each predicate a subject uses casts a vote for the subject's type,
    * weighted by the conditional distribution `P(type | pred)` observed
    * over the entities whose types ARE known. An entity the alias
    * dictionary could not type (the [[graft.kg.Kg.mineAliases]] regime:
    * new vocabulary the crawl surfaced) is assigned the argmax of its
    * summed votes. Votes are SCALED-INTEGER micros
    * (`(n_pt * 1e6) div n_p`, exact integer division) so every sum and
    * the final ranking are exact in any engine — the q104 weighted-fusion
    * determinism pattern.
    *
    * @param triples `(subj, pred, obj)` — usage evidence (duplicates
    *                fine; collapsed to distinct subject–predicate use)
    * @param typed   `(entity_id, category)` — the known direct types
    * @return one row per untyped subject that shares at least one
    *         predicate with a typed subject:
    *         `(entity_id, inferred_type, n_preds, score_micro,
    *         confidence)` where `n_preds` counts the subject's
    *         vote-carrying predicates and
    *         `confidence = score_micro / (n_preds·1e6)` — 1.0 means every
    *         predicate the subject uses is used ONLY by entities of the
    *         inferred type. Ties break to the lexicographically smallest
    *         type (deterministic).
    *
    * Scale shape: usage collapses once to distinct `(subj, pred)`
    * (map-side combined, keyed by subject — hot predicates never key an
    * exchange); the vote table is |vocab|×|types| and broadcast; the
    * vote-sum aggregation keys on subject; the argmax is a per-subject
    * window over at most |types| rows. Nothing corpus-sized crosses the
    * network more than once. */
  def inferTypesByUsage(triples: DataFrame, typed: DataFrame): DataFrame = {
    val usage = triples.select("subj", "pred").distinct()
    val ty = typed.select(col("entity_id").as("subj"), col("category"))
    val tu = usage.join(ty, "subj")
    val np = tu.groupBy("pred").agg(count(lit(1)).as("n_p"))
    val votes = tu.groupBy(col("pred"), col("category").as("type"))
      .agg(count(lit(1)).as("n_pt"))
      .join(np, "pred")
      .select(col("pred"), col("type"),
        expr("(n_pt * 1000000L) div n_p").as("vote_micro"))
    val untypedUse = usage.join(ty.select("subj"), Seq("subj"), "left_anti")
    val scored = untypedUse.join(broadcast(votes), "pred")
    val scores = scored.groupBy(col("subj"), col("type"))
      .agg(sum(col("vote_micro")).as("score_micro"))
    val nPreds = scored.select("subj", "pred").distinct()
      .groupBy("subj").agg(count(lit(1)).as("n_preds"))
    val byScore = org.apache.spark.sql.expressions.Window
      .partitionBy("subj").orderBy(col("score_micro").desc, col("type").asc)
    scores.withColumn("rn", row_number().over(byScore))
      .filter(col("rn") === 1)
      .join(nPreds, "subj")
      .select(col("subj").as("entity_id"), col("type").as("inferred_type"),
        col("n_preds"), col("score_micro"),
        round(col("score_micro") / (col("n_preds") * 1000000.0), 4)
          .as("confidence"))
  }

  /** VoID-style class–property completeness profile (`void:classPartition`
    * / `void:propertyPartition`; the per-class coverage signal behind KB
    * completeness prediction — Galárraga et al., WSDM 2017): per
    * `(type, pred)` observed in the KG, how many entities of the type
    * appear as a subject at all, how many carry at least one fact of the
    * predicate, and the coverage ratio. The profile is what a curator
    * reads to decide which relation the NEXT extraction round should
    * target — the completeness complement of [[functionalViolations]]'
    * (too many facts) and [[domainViolations]]' (wrong class) audits.
    *
    * @param triples `(subj, pred, obj)` extracted triples
    * @param types   `(entity_id, type)` — [[inferTypes]]' closure output
    * @return `(type, pred, n_entities, n_with_pred, coverage)`; pairs no
    *         entity exhibits are absent (VoID partition semantics —
    *         coverage of an undeclared pair is a schema question, not a
    *         data one)
    *
    * Scale shape: ONE distinct `(subj, pred)` collapse feeds both the
    * numerator and (re-collapsed to subjects) the denominator; the type
    * table joins on subject — entity-vocabulary-sized, AQE picks
    * broadcast when it measures small; both aggregations are map-side
    * combined and the final join meets two |types|×|vocab|-bounded
    * relations. */
  def completenessProfile(triples: DataFrame, types: DataFrame): DataFrame = {
    val sp = triples.select("subj", "pred").distinct()
    val ty = types.select(col("entity_id").as("subj"), col("type"))
    val denom = sp.select("subj").distinct().join(ty, "subj")
      .groupBy("type").agg(count(lit(1)).as("n_entities"))
    sp.join(ty, "subj")
      .groupBy("type", "pred").agg(count(lit(1)).as("n_with_pred"))
      .join(broadcast(denom), "type")
      .select(col("type"), col("pred"), col("n_entities"), col("n_with_pred"),
        round(col("n_with_pred") / col("n_entities"), 4).as("coverage"))
  }

  /** The ACTION on [[alignPredicates]]' measurement: merge two extractor
    * KGs into one vocabulary. Alignment pairs at or above `minJaccard`
    * become a rename map (best `pred_a` per `pred_b` — highest overlap,
    * ties to the lexicographically smallest canon), B's facts are
    * rewritten through it (unaligned B predicates keep their own name —
    * novel vocabulary must survive a merge, not vanish), and the union is
    * collapsed to distinct facts with per-side provenance:
    * `(subj, pred, obj, in_a, in_b)`. The same measure-then-act
    * composition as near-dup pairs → cluster collapse (q61).
    *
    * Scale shape: the alignment legs are vocabulary-sized and the rename
    * map is broadcast onto B's fact stream (narrow); the only
    * corpus-sized exchange is the final distinct-with-provenance
    * aggregation, map-side combined on the full fact key.
    */
  def mergeAligned(a: DataFrame, b: DataFrame, minJaccard: Double): DataFrame = {
    val byPredB = org.apache.spark.sql.expressions.Window
      .partitionBy("pred_b").orderBy(col("jaccard").desc, col("pred_a").asc)
    // ONE distinct collapse per side feeds the alignment's totals +
    // overlap AND the merge's union legs — identical subtrees, so the
    // runtime shares one exchange instead of re-running the extraction
    val da = distinctFacts(a)
    val db = distinctFacts(b)
    val renames = alignDistinct(da, db)
      .filter(col("jaccard") >= minJaccard)
      .withColumn("rn", row_number().over(byPredB))
      .filter(col("rn") === 1)
      .select(col("pred_b"), col("pred_a").as("canon"))
    val ua = da.withColumn("side", lit("a"))
    val ub = db
      .join(broadcast(renames), col("pred") === col("pred_b"), "left")
      .select(col("subj"), coalesce(col("canon"), col("pred")).as("pred"),
        col("obj"), lit("b").as("side"))
    ua.union(ub)
      .groupBy("subj", "pred", "obj")
      .agg(
        (max(when(col("side") === "a", 1).otherwise(0)) === 1).as("in_a"),
        (max(when(col("side") === "b", 1).otherwise(0)) === 1).as("in_b"))
  }

  /** Capture–recapture KG recall estimation per predicate (Lincoln–
    * Petersen, with Chapman's 1951 bias-corrected form) — the
    * non-parametric completeness method the KG literature applies when
    * the true fact population is unobservable (Luggen et al.,
    * "Non-Parametric Class Completeness Estimation", ISWC 2019;
    * Trushkowsky et al., ICDE 2013 crowd-enumeration): treat two
    * independent extraction runs as two "captures" of the same unknown
    * fact population, and the overlap rate estimates the population
    * size — `n̂ = n_a·n_b / n_both` — hence each side's recall.
    *
    * Both inputs must share one predicate vocabulary (align with
    * [[alignPredicates]] first if they don't). Output one row per
    * predicate observed on both sides:
    * `(pred, n_a, n_b, n_both, est_petersen, est_chapman, recall_a,
    * recall_b)` — recalls are against the Chapman estimate (defined even
    * at zero overlap); the Petersen column is NULL when the overlap is
    * empty rather than a division blow-up.
    *
    * Scale shape: two distinct-fact collapses (map-side combined), one
    * equi-join on the full fact key for the overlap, then everything
    * downstream is vocabulary-sized — the three per-predicate aggregates
    * meet in broadcast joins. Nothing corpus-sized is exchanged twice.
    */
  def captureRecapture(a: DataFrame, b: DataFrame): DataFrame = {
    val da = distinctFacts(a)
    val db = distinctFacts(b)
    val na = da.groupBy("pred").agg(count(lit(1)).as("n_a"))
    val nb = db.groupBy("pred").agg(count(lit(1)).as("n_b"))
    val nboth = da.join(db, Seq("subj", "pred", "obj"))
      .groupBy("pred").agg(count(lit(1)).as("n_both"))
    val chapman = (col("n_a") + 1) * (col("n_b") + 1) /
      (col("n_both") + 1) - 1
    // predicates observed on BOTH sides anchor the output; the overlap
    // joins in from the LEFT so disjoint captures — the worst-recall
    // case this estimator exists to surface — report n_both = 0 with a
    // NULL Petersen and a still-defined Chapman, instead of vanishing
    na.join(nb, "pred")
      .join(broadcast(nboth), Seq("pred"), "left")
      .withColumn("n_both", coalesce(col("n_both"), lit(0L)))
      .select(col("pred"), col("n_a"), col("n_b"), col("n_both"),
        round(col("n_a") * col("n_b") / nullif(col("n_both"), lit(0)), 4)
          .as("est_petersen"),
        round(chapman, 4).as("est_chapman"),
        round(col("n_a") / chapman, 4).as("recall_a"),
        round(col("n_b") / chapman, 4).as("recall_b"))
  }

  /** VoID-style predicate cardinality profile — the dataset-statistics
    * block (`void:properties`, `void:distinctSubjects`/`Objects`,
    * W3C VoID vocabulary) every published KG ships, and the planner input
    * for the BGP join-ordering the engine's q81-style pattern queries
    * rely on: per predicate, the triple count, distinct subject/object
    * counts, and the mean out-multiplicity `n_triples / n_subj` (a
    * functionality score: 1.0 means the predicate behaves functionally
    * in the data regardless of declaration — the discovery complement of
    * [[functionalViolations]]'s declared audit).
    *
    * Scale shape: one aggregation keyed by pred with two distinct
    * measures — Catalyst plans the multi-distinct as an Expand (3 rows
    * per input) + two-phase aggregate, all map-side-combinable; output is
    * predicate-vocabulary-sized. */
  def predicateProfile(triples: DataFrame): DataFrame =
    triples
      .groupBy(col("pred"))
      .agg(
        count(lit(1)).as("n_triples"),
        count_distinct(col("subj")).as("n_subj"),
        count_distinct(col("obj")).as("n_obj"))
      .withColumn("avg_fanout",
        round(col("n_triples") / col("n_subj"), 4))

  /** Strict transitive closure of a declared `subClassOf` edge set,
    * computed on the DRIVER. This is deliberate, not a shortcut: an
    * ontology is pipeline METADATA like the prompt templates and the
    * alias dictionary — declared, versioned, and O(10³) classes for the
    * largest published vocabularies (schema.org ≈ 900, DBpedia ≈ 800) —
    * while the instance stream is O(10⁹). Closure cost is
    * O(edges · depth) once per job; the result broadcasts. The
    * distributed-iterative machinery (CC/k-core/BFS) is for DATA-sized
    * graphs and would spend a Spark job per ontology level for nothing.
    */
  def subclassClosure(sub: Seq[(String, String)]): Seq[(String, String)] = {
    require(sub.forall { case (c, p) => c != p },
      "subClassOf declarations must be irreflexive")
    var cl = sub.toSet
    var grown = true
    while (grown) {
      val next = cl ++ (for ((c, p) <- cl; (c2, p2) <- cl if p == c2)
        yield (c, p2))
      require(next.forall { case (c, p) => c != p },
        "subClassOf hierarchy contains a cycle")
      grown = next.size != cl.size
      cl = next
    }
    cl.toSeq.sorted
  }

  /** RDFS-style materialized type inference: every instance carries its
    * direct class plus every superclass from the closure —
    * `(entity_id, type)`, distinct.
    *
    * Scale shape: the closure is a broadcast-joined metadata relation
    * (see [[subclassClosure]]); the instance stream stays narrow (one
    * broadcast join + a union), and the final distinct is the only
    * exchange, keyed by (entity, type) which hot classes cannot skew —
    * every row is already unique per entity.
    *
    * @param instances distinct `(entity_id, category)` rows — the linked
    *                  entities with their direct class
    * @param sub       declared direct `subClassOf` edges (class → parent)
    */
  def inferTypes(spark: SparkSession, instances: DataFrame,
      sub: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    val cl = subclassClosure(sub).toDF("c", "p")
    instances.select(col("entity_id"), col("category").as("type"))
      .union(instances.join(broadcast(cl), col("category") === col("c"))
        .select(col("entity_id"), col("p").as("type")))
      .distinct()
  }
}
