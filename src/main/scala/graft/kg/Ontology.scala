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
