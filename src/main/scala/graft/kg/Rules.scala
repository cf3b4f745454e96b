package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Horn-rule mining over a materialized KG — the AMIE family (Galárraga
  * et al., "AMIE: Association Rule Mining under Incomplete Evidence in
  * Ontological Knowledge Bases", WWW 2013): discover `body ⇒ head`
  * rules whose groundings the KG itself supports, scored by support,
  * standard confidence, and head coverage. Rules are what turn an
  * extracted KG into MORE KG — a high-confidence rule both predicts
  * missing facts (the link-prediction signal q88-q98 measure per-edge,
  * here lifted to the schema level) and audits extractor consistency
  * (a rule that SHOULD hold at ~1.0 but reads 0.6 marks extraction
  * gaps — the completeness signal [[Ontology.completenessProfile]]
  * reports per class, here per rule).
  */
object Rules {

  /** Mine all closed path rules of length 2 — `p(x,y) ∧ q(y,z) ⇒ r(x,z)`,
    * AMIE's canonical shape — scored over distinct groundings:
    *
    *   - `n_body`  = |{(x,z) : ∃y. p(x,y) ∧ q(y,z)}|
    *   - `n_head`  = |{(x,z) : r(x,z)}|
    *   - `support` = |body pairs on which the head fact is asserted|
    *   - `confidence`    = support / n_body  (AMIE std confidence: the
    *     closed-world reading — how often the body predicts a KNOWN head)
    *   - `n_body_pca` = |body pairs whose `x` asserts ANY `r` fact| —
    *     AMIE's partial-completeness denominator: a body pair whose
    *     subject the KG knows nothing about under `r` is treated as
    *     UNKNOWN, not false
    *   - `pca_confidence` = support / n_body_pca (AMIE's headline metric
    *     for incomplete KBs; ≥ std confidence by construction)
    *   - `head_coverage` = support / n_head  (how much of the head
    *     relation the rule explains — AMIE's pruning metric)
    *
    * Returns one row per `(body_p, body_q, head_r)` passing both floors:
    * `(body_p, body_q, head_r, n_body, n_head, support, confidence,
    * n_body_pca, pca_confidence, head_coverage)`. Measurement-only, like
    * [[Ontology.alignPredicates]]:
    * applying a rule (materializing its predicted-but-missing heads with
    * `inferred` provenance) is [[Ontology.enrichInverses]]' union-and-
    * collapse pattern pointed at the rule's body join, and stays with
    * the consumer because rule application is a POLICY (which confidence
    * floor, PCA vs std confidence) where mining is a measurement.
    *
    * Scale shape: ONE distinct-fact collapse feeds the path join, the
    * head stream, and the head totals (byte-identical subtrees →
    * exchange reuse). The path join keys on the shared node `y`; per-node
    * fan-out is in-degree × out-degree, the same hot-node exposure as
    * [[TriplePatterns.chain]] — AQE's skew join covers the moderate form
    * and the immediate distinct collapse on `(p, q, x, z)` stops the fan
    * from surviving past one exchange. The support join meets two
    * (x, z)-keyed streams co-partitioned by construction; the PCA join
    * keys the body pairs on `x` against the distinct (pred, subject)
    * relation — vocabulary × subject-vocabulary sized, so AQE broadcasts
    * it when it measures small and the hot-subject exposure is the same
    * as the path join's (skew-join covered). Per-rule totals are
    * vocabulary²-sized and broadcast.
    *
    * @param triples    `(subj, pred, obj)` rows (duplicates fine —
    *                   collapsed to distinct facts first)
    * @param minSupport keep rules with at least this many supporting
    *                   distinct groundings
    * @param minConf    keep rules at or above this std confidence,
    *                   compared on the round-4 value so engine and
    *                   replay gate identically
    */
  def minePathRules(triples: DataFrame, minSupport: Long,
      minConf: Double): DataFrame = {
    val d = triples.select("subj", "pred", "obj").distinct()
    val body = d.as("a")
      .join(d.as("b"), col("a.obj") === col("b.subj"))
      .select(col("a.pred").as("body_p"), col("b.pred").as("body_q"),
        col("a.subj").as("x"), col("b.obj").as("z"))
      .distinct()
    val heads = d.select(col("pred").as("head_r"), col("subj").as("x"),
      col("obj").as("z"))
    val nBody = body.groupBy("body_p", "body_q")
      .agg(count(lit(1)).as("n_body"))
    val nHead = heads.groupBy("head_r").agg(count(lit(1)).as("n_head"))
    val headSubj = d.select(col("pred").as("head_r"), col("subj").as("x"))
      .distinct()
    val nPca = body.join(headSubj, "x")
      .groupBy("body_p", "body_q", "head_r")
      .agg(count(lit(1)).as("n_body_pca"))
    body.join(heads, Seq("x", "z"))
      .groupBy("body_p", "body_q", "head_r")
      .agg(count(lit(1)).as("support"))
      .join(nBody, Seq("body_p", "body_q"))
      .join(broadcast(nHead), "head_r")
      // support ≥ 1 ⇒ some body x asserts r, so the PCA group exists
      .join(nPca, Seq("body_p", "body_q", "head_r"))
      .withColumn("confidence",
        round(col("support") / col("n_body"), 4))
      .withColumn("pca_confidence",
        round(col("support") / col("n_body_pca"), 4))
      .withColumn("head_coverage",
        round(col("support") / col("n_head"), 4))
      .filter(col("support") >= minSupport && col("confidence") >= minConf)
      .select(col("body_p"), col("body_q"), col("head_r"), col("n_body"),
        col("n_head"), col("support"), col("confidence"),
        col("n_body_pca"), col("pca_confidence"), col("head_coverage"))
  }

  /** The ACTION on [[minePathRules]]' measurement — forward-chain the
    * accepted rules once: every body grounding `p(x,y) ∧ q(y,z)` of an
    * accepted rule entails `head_r(x, z)`; entailed facts the KG does
    * not assert are added with provenance `inferred`, asserted facts
    * keep `asserted` (the [[Ontology.enrichInverses]] union-and-collapse
    * pattern pointed at the rule's body join — rule application is how
    * a mined rule actually grows the KG). Which rules to accept (the
    * confidence floor, std vs PCA confidence) is the caller's policy;
    * pass the filtered rule set. One chaining round only — iterate to a
    * fixpoint by re-running if the rule set is recursive (AMIE applies
    * one round too; entailed facts here are groundings over ASSERTED
    * bodies). Reflexive groundings (`x = z`) entail like any other —
    * filter the body pairs first if self-facts are meaningless for the
    * head predicate.
    *
    * @param triples `(subj, pred, obj)` rows (duplicates fine)
    * @param rules   accepted rules carrying `(body_p, body_q, head_r)` —
    *                extra scoring columns are ignored; must be small
    *                (vocabulary²-bounded by construction)
    * @return `(subj, pred, obj, provenance)` — distinct by construction
    *
    * Scale shape: the rule set joins the path stream as a broadcast on
    * `(body_p, body_q)` BEFORE any distinct, so non-rule body pairs are
    * dropped map-side and never exchanged; the only corpus-sized
    * exchange is the final provenance collapse on the full fact key. */
  def applyRules(triples: DataFrame, rules: DataFrame): DataFrame = {
    val d = triples.select("subj", "pred", "obj").distinct()
    val entailed = d.as("a")
      .join(d.as("b"), col("a.obj") === col("b.subj"))
      .select(col("a.pred").as("body_p"), col("b.pred").as("body_q"),
        col("a.subj").as("x"), col("b.obj").as("z"))
      .join(broadcast(rules.select("body_p", "body_q", "head_r")),
        Seq("body_p", "body_q"))
      .select(col("x").as("subj"), col("head_r").as("pred"),
        col("z").as("obj"), lit("i").as("src"))
    d.withColumn("src", lit("a"))
      .unionByName(entailed)
      .groupBy("subj", "pred", "obj")
      .agg(when(max(when(col("src") === "a", 1).otherwise(0)) === 1,
        "asserted").otherwise("inferred").as("provenance"))
  }
}
