package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SPARQL-style triple-pattern compositions over a materialized KG — the
  * read side of KG construction. Once the pipeline lands `(subj, pred,
  * obj)` snapshots, consumers ask basic-graph-pattern (BGP) questions and
  * operators compare snapshots across crawls; both are plain relational
  * plans here, so Catalyst gets to pick join strategies and AQE gets to
  * re-plan on measured sizes — exactly what a native triple store's
  * hand-written join orderer has to do itself.
  */
object TriplePatterns {

  /** Star BGP on a shared object: `?a predA ?o . ?b predB ?o` →
    * `(obj, subj_a, subj_b)`. With the pipeline's doc-grounded triples
    * this reads "entities of two categories grounded in the SAME page" —
    * the join that feeds co-mention relation proposal and page-level
    * fact tables.
    *
    * Scale shape: both sides are predicate-filtered BEFORE the join (the
    * filter reaches the parquet scan as a pushed predicate on `pred`, so
    * a snapshot partitioned or sorted by predicate prunes files), then
    * hash-join on `obj`. Per-object fan-out is |predA subjects| ×
    * |predB subjects| on that object — bounded by per-page mention
    * counts, never corpus-sized. A pathological hot object is exactly
    * the q08/q52 salting case and AQE's skew-join handles the moderate
    * version for free.
    *
    * @param triples distinct `(subj, pred, obj)` rows
    */
  def starOnObject(triples: DataFrame, predA: String,
      predB: String): DataFrame =
    triples.filter(col("pred") === predA)
      .select(col("obj"), col("subj").as("subj_a"))
      .join(triples.filter(col("pred") === predB)
        .select(col("obj"), col("subj").as("subj_b")), "obj")

  /** Chain BGP (SPARQL property-path composition `predA/predB`):
    * `?s predA ?m . ?m predB ?o` → `(subj, obj, n_paths)` where
    * `n_paths` counts the distinct intermediates connecting the pair
    * (triples are distinct by contract, so each mid contributes exactly
    * one path). With the pipeline's doc-grounded triples plus the
    * doc-metadata triples (`doc://… from_source …`, `doc://… in_lang …`)
    * this reads e.g. "which corpus sources ground each entity's facts,
    * and how many pages deep" — the provenance profile a KG consumer
    * asks for before trusting an entity's facts.
    *
    * Scale shape: both legs predicate-filter BEFORE the join (pushed to
    * the scan; a predicate-partitioned snapshot prunes files), then ONE
    * hash join on the shared node `mid` — the object side of A
    * co-partitioned with the subject side of B, which is the join
    * ordering [[graft.kg.Ontology.predicateProfile]]'s VoID stats exist
    * to justify. Per-mid fan-out = outdeg(predB) × indeg(predA) on that
    * node — per-page-bounded here; a pathological hot mid is the
    * q08/q52 salting case and AQE's skew join covers the moderate form.
    * The final count collapses map-side on (subj, obj).
    */
  def chain(triples: DataFrame, predA: String, predB: String): DataFrame =
    triples.filter(col("pred") === predA)
      .select(col("subj"), col("obj").as("mid"))
      .join(triples.filter(col("pred") === predB)
        .select(col("subj").as("mid"), col("obj")), "mid")
      .groupBy(col("subj"), col("obj"))
      .agg(count(lit(1)).as("n_paths"))

  /** Diff two KG snapshots keyed by the full triple:
    * `(subj, pred, obj, status)` with status ∈ kept | added | removed
    * (kept = in both, added = only in `b`, removed = only in `a`) — the
    * crawl-over-crawl audit that MERGE (q51) applies and this REPORTS.
    *
    * Both sides must be distinct on `(subj, pred, obj)` (the pipeline's
    * triples are; same documented precondition as
    * [[SnapshotMerge]]'s base) — duplicate keys would multiply
    * full-outer matches. Scale shape: one co-partitioned full-outer
    * sort-merge join on the triple key; landing both snapshots as
    * `bucketBy`(triple-key) tables (the q49 layout) deletes even that
    * exchange for repeated diffs.
    */
  def snapshotDiff(a: DataFrame, b: DataFrame): DataFrame = {
    val key = Seq("subj", "pred", "obj")
    a.select(key.map(col): _*).withColumn("in_a", lit(true))
      .join(b.select(key.map(col): _*).withColumn("in_b", lit(true)),
        key, "full_outer")
      .select(col("subj"), col("pred"), col("obj"),
        when(col("in_a").isNotNull && col("in_b").isNotNull, "kept")
          .when(col("in_b").isNotNull, "added")
          .otherwise("removed").as("status"))
  }

  /** Temporal scoping of facts — the provenance window a temporal KG
    * attaches to each `(subj, pred)`: over triples carrying a crawl
    * timestamp column `ts_s` (epoch seconds), the first/last time the
    * fact was observed, how many distinct pages ground it, and the
    * validity span: `(subj, pred, n_obs, first_seen_s, last_seen_s,
    * span_s)`.
    *
    * One map-side-combined aggregate keyed by (subj, pred); min/max/count
    * only, so a head entity grounded by millions of pages costs
    * comparisons, never a buffer.
    */
  def temporalScope(triples: DataFrame): DataFrame =
    triples.groupBy(col("subj"), col("pred"))
      .agg(count(lit(1)).as("n_obs"),
        min(col("ts_s")).as("first_seen_s"),
        max(col("ts_s")).as("last_seen_s"))
      .withColumn("span_s", col("last_seen_s") - col("first_seen_s"))
}
