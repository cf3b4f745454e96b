package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity summarization — the top-k facts a KG consumer shows on an
  * entity panel (the RELIN family: Cheng, Tran & Qu, "RELIN:
  * Relatedness and Informativeness-based Centrality for Entity
  * Summarization", ISWC 2011). The ranking signal here is the
  * informativeness half: a fact is informative in proportion to how
  * RARE its `(pred, obj)` value is across the KG — "born in Honolulu"
  * distinguishes an entity; "type Thing" does not. Relatedness (the
  * other RELIN half) needs per-consumer context and stays with the
  * caller.
  */
object Summarize {

  /** Top-k most-distinguishing facts per subject: rank each subject's
    * facts by ascending corpus frequency of the `(pred, obj)` value
    * (rarest first — the exact-count analog of RELIN's informativeness
    * `-log P(pred, obj)`, monotone-equivalent so no float enters the
    * ranking), ties broken lexicographically on `(pred, obj)` for
    * determinism. Returns `(subj, pred, obj, n_po, rank)` with
    * `rank <= k`.
    *
    * Scale shape: one distinct-fact collapse feeds both the value-
    * frequency aggregate (map-side combined, keyed `(pred, obj)` — a
    * hot value never keys more than one exchange) and the join back
    * (same key, co-partitioned with the aggregate; AQE broadcasts the
    * frequency table when the value vocabulary measures small). The
    * per-subject top-k is a rank-limited window — Spark's
    * WindowGroupLimit pushes the `rank <= k` filter below the sort, so
    * a head entity with millions of facts keeps k rows per partition,
    * never a full buffer.
    */
  def topFacts(triples: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val d = triples.select("subj", "pred", "obj").distinct()
    val po = d.groupBy("pred", "obj").agg(count(lit(1)).as("n_po"))
    val w = Window.partitionBy("subj")
      .orderBy(col("n_po").asc, col("pred").asc, col("obj").asc)
    d.join(po, Seq("pred", "obj"))
      // long rank: cross-engine consumers (and the DuckDB gate) see
      // BIGINT window functions
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("subj"), col("pred"), col("obj"), col("n_po"), col("rank"))
  }

  /** Schema (quotient) graph summarization — the structural summary a KG
    * consumer reads before writing a single BGP: collapse the instance
    * graph onto its TYPES, so each output row is one edge of the schema
    * graph `(subj_type, pred, obj_type)` with its instance support:
    * `n_facts` (distinct instance triples), `n_subj` / `n_obj` (distinct
    * participating instances). This is the classic graph-summarization
    * quotient under the type-equivalence relation (Goldman & Widom's
    * DataGuides lineage; Čebirić et al., "Summarizing Semantic Graphs",
    * VLDB J. 2019 survey) and doubles as observed-schema discovery:
    * rows ARE the predicate signatures usage exhibits, against which
    * [[Ontology.domainViolations]]' declared signatures can be compared.
    *
    * Nodes absent from `types` summarize as `untyped` — a REAL bucket
    * (web KGs never have full type coverage), not an error.
    *
    * Scale shape: one distinct-fact collapse, then two left joins
    * against the type map — vocabulary-sized (entities, not mentions),
    * so AQE broadcasts it in the common case — then one
    * map-side-combined aggregate on the `(subj_type, pred, obj_type)`
    * key, whose cardinality is schema-sized (|types|² × |preds| worst
    * case, in practice tiny). The two distinct-counts share one expand;
    * no window, no explode. A node with two DISTINCT types would
    * multiply facts through the join by design (quotient semantics) —
    * callers pass a FUNCTIONAL type map ([[Ontology.inferTypesByUsage]]'
    * argmax or the alias dictionary's category), which this contract
    * documents rather than re-checks. Duplicate IDENTICAL `(node, type)`
    * rows, though — a functional map built straight from a mention
    * stream — are collapsed here: without the distinct each duplicate
    * multiplies `n_facts` (count(*)) while `n_subj`/`n_obj` stay
    * distinct-counted, an internally inconsistent summary row.
    *
    * @param triples `(subj, pred, obj)` instance triples
    * @param types   functional `(node, type)` map
    * @param untyped type bucket for nodes not in `types`
    */
  def schemaGraph(triples: DataFrame, types: DataFrame,
      untyped: String = "untyped"): DataFrame = {
    val d = triples.select("subj", "pred", "obj").distinct()
    val ty = types.select("node", "type").distinct()
    d.join(ty.select(col("node").as("subj"), col("type").as("subj_type")),
        Seq("subj"), "left")
      .join(ty.select(col("node").as("obj"), col("type").as("obj_type")),
        Seq("obj"), "left")
      .select(
        coalesce(col("subj_type"), lit(untyped)).as("subj_type"),
        col("pred"),
        coalesce(col("obj_type"), lit(untyped)).as("obj_type"),
        col("subj"), col("obj"))
      .groupBy("subj_type", "pred", "obj_type")
      .agg(count(lit(1)).as("n_facts"),
        countDistinct(col("subj")).as("n_subj"),
        countDistinct(col("obj")).as("n_obj"))
  }

  /** KG → text linearization: serialize each subject's facts into ONE
    * canonical training document
    * `pred1=obj_a,obj_b|pred2=obj_c` — the KG-verbalization input step
    * (the corpus shape of KELM: Agarwal et al., "Knowledge Graph Based
    * Synthetic Corpus Generation for Knowledge-Enhanced Language Model
    * Pre-training", NAACL 2021 — we produce the deterministic
    * linearization; the paper's seq2seq verbalizer consumes it). Every
    * ordering is pinned (objects ascending within a predicate,
    * predicate groups ascending) so the document is byte-reproducible —
    * a training corpus that changes bytes across identical runs poisons
    * dedup and caching downstream.
    *
    * Hub safety: a celebrity entity carries unbounded facts, so each
    * `(subj, pred)` group keeps only its `maxObjsPerPred` FIRST objects
    * (ascending — deterministic, not sampled) in the document, while
    * `n_facts` still counts everything; the cap bounds both the row
    * width and the per-group state at scale. Truncation is visible:
    * capped groups end with `,…`.
    *
    * @return `(subj, n_facts, doc)` — one row per subject
    *
    * Scale shape: one distinct-fact collapse, a per-`(subj, pred)` rank
    * window that bounds state BEFORE anything collects (rows beyond the
    * cap never enter an array buffer), then two map-side-combined
    * aggregates keyed `(subj, pred)` and `subj`; per-key payload is
    * cap-bounded, so a hub key costs bandwidth, never memory. */
  def linearize(triples: DataFrame, maxObjsPerPred: Int): DataFrame = {
    require(maxObjsPerPred >= 1, "cap must keep at least one object")
    val d = triples.select("subj", "pred", "obj").distinct()
    val byObj = Window.partitionBy("subj", "pred").orderBy("obj")
    val pp = d.withColumn("__rn", row_number().over(byObj))
      .filter(col("__rn") <= maxObjsPerPred + 1)
      .groupBy("subj", "pred")
      .agg(
        max(col("__rn")).as("__seen"),
        sort_array(collect_list(
          when(col("__rn") <= maxObjsPerPred, col("obj")))).as("__objs"))
      .select(col("subj"),
        concat(col("pred"), lit("="), concat_ws(",", col("__objs")),
          when(col("__seen") > maxObjsPerPred, ",…").otherwise(""))
          .as("pp"))
    val counts = d.groupBy("subj", "pred").agg(count(lit(1)).as("n"))
      .groupBy("subj").agg(sum(col("n")).as("n_facts"))
    pp.groupBy("subj")
      .agg(sort_array(collect_list(col("pp"))).as("__pps"))
      .join(counts, "subj")
      .select(col("subj"), col("n_facts"),
        concat_ws("|", col("__pps")).as("doc"))
  }
}
