package graft.kg

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Knowledge-graph construction operators (SURVEY.md §7 stage 3): candidate
  * generation via a broadcast alias dictionary, skew-safe disambiguation via
  * a salted hash join + top-1 window, and `(subj, pred, obj)` triple
  * materialization. The reference has no joins at all (SURVEY.md §2, "joins"
  * note) — these are the new first-class capabilities the north rule adds.
  */
object Kg {

  /** The engine's demo alias dictionary: normalized surface → canonical
    * entity id with a prior score. Small by construction → always broadcast. */
  val Aliases: Seq[(String, String, Double)] = Seq(
    ("spark", "ent:spark", 1.0),
    ("hash join", "ent:hash_join", 0.9),
    ("table scan", "ent:table_scan", 0.9),
    ("merge", "ent:merge", 0.8),
    ("sort", "ent:sort", 0.8),
    ("customer", "ent:customer", 0.7),
    ("vector", "ent:vector", 0.6),
    ("stream", "ent:stream", 0.6))

  /** Pipeline dictionary with duplicate-entity aliases: "spark" also maps to
    * a lower-scored duplicate id, which the alias-graph connected components
    * must canonicalize (SURVEY.md §7 stage 3c). Disambiguation still picks
    * the top-scored candidate per mention. */
  val AliasesExtended: Seq[(String, String, Double)] = Aliases ++ Seq(
    ("spark", "ent:apache_spark", 0.95),
    ("apache spark", "ent:apache_spark", 1.0),
    ("merge", "ent:merge_op", 0.75),
    ("merge operation", "ent:merge_op", 0.9))

  def aliasDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Aliases.toDF("alias", "entity_id", "score")
  }

  /** Candidate generation: broadcast hash join of mentions × alias
    * dictionary on the normalized surface (`lower(trim(surface))`).
    * Left join — unresolved mentions survive with null entity_id so they can
    * be routed via left-anti downstream (SURVEY.md §2 joins note). */
  def candidates(mentions: DataFrame, aliases: DataFrame): DataFrame =
    mentions.join(
      broadcast(aliases),
      lower(trim(mentions("surface"))) === aliases("alias"),
      "left")

  /** Alias-dictionary bootstrap — mine NEW alias→entity mappings from
    * document co-occurrence, the step that grows the broadcast dictionary
    * [[candidates]] joins against (the Wikipedia-anchor method: estimate
    * `P(entity | surface)` from contexts where both are observed; Spitkovsky
    * & Chang LREC 2012 is the canonical published form). A surface the
    * dictionary can NOT link is a candidate alias for entity `e` in
    * proportion to how often the pages containing the surface also
    * confidently link `e`:
    * `confidence = |docs(surface) ∩ docs(e)| / |docs(surface)|`.
    *
    * @param unlinked `(doc_id, surface)` mention stream the dictionary
    *                 missed (any multiplicity — collapsed to per-doc
    *                 presence internally)
    * @param linked   `(doc_id, entity_id)` confidently-linked entities
    *                 (any multiplicity — collapsed likewise)
    * @return `(surface, entity_id, n_docs_both, n_docs_surface,
    *         confidence)` for pairs with `n_docs_both >= minSupport` and
    *         `confidence >= minConf` — append the winners to the
    *         dictionary and re-run [[candidates]]; that loop is the
    *         bootstrap.
    *
    * Scale shape: both streams collapse to distinct per-doc presence
    * (map-side combined, keyed by doc — no hot surface ever keys an
    * exchange), the co-occurrence join is doc-keyed (per-doc fan-out =
    * distinct surfaces × distinct entities on that page, page-bounded),
    * and the per-surface totals re-join on `surface` — vocabulary-sized
    * by then, and AQE broadcasts it when it measures small. Confidence
    * is one exact integer division rounded to 4 decimals: identical
    * operands give identical IEEE results in any engine, so the DuckDB
    * gate compares exactly.
    */
  def mineAliases(unlinked: DataFrame, linked: DataFrame,
      minSupport: Long, minConf: Double): DataFrame = {
    val ds = unlinked
      .select(col("doc_id"), lower(trim(col("surface"))).as("surface"))
      .distinct()
    val de = linked.select(col("doc_id"), col("entity_id")).distinct()
    val nSurf = ds.groupBy("surface")
      .agg(count(lit(1)).as("n_docs_surface"))
    ds.join(de, "doc_id")
      .groupBy(col("surface"), col("entity_id"))
      .agg(count(lit(1)).as("n_docs_both"))
      .join(nSurf, "surface")
      .withColumn("confidence",
        round(col("n_docs_both") / col("n_docs_surface"), 4))
      .filter(col("n_docs_both") >= minSupport &&
        col("confidence") >= minConf)
      .select(col("surface"), col("entity_id"), col("n_docs_both"),
        col("n_docs_surface"), col("confidence"))
  }

  /** Grounding-ambiguity audit over [[mineAliases]]' co-occurrence
    * evidence — the read that decides which mined aliases are SAFE to
    * append to the dictionary. [[mineAliases]] thresholds each
    * `(surface, entity)` pair independently; this aggregates the same
    * evidence PER SURFACE into the Shannon entropy of its grounding
    * distribution `P(entity | surface)` (the anchor-dictionary ambiguity
    * measure of Spitkovsky & Chang, LREC 2012): entropy ≈ 0 means the
    * surface grounds one entity and auto-appending is safe; high entropy
    * means the surface is genuinely ambiguous and belongs to the
    * context-disambiguation path, not the dictionary.
    *
    * @param unlinked `(doc_id, surface)` mentions the dictionary missed
    * @param linked   `(doc_id, entity_id)` confidently-linked entities
    * @return one row per unresolved surface that co-occurs with at least
    *         one linked entity: `(surface, n_entities, n_docs_total,
    *         top_share, entropy)` — `n_docs_total` sums the per-entity
    *         co-occurrence doc counts, `top_share` is the majority
    *         entity's share, entropy is natural-log, both rounded to 4
    *         (the q66/q90 cross-engine float discipline: identical
    *         integer operands through ln/divide, compared post-round).
    *
    * Scale shape: the evidence lineage is [[mineAliases]]' (per-doc
    * presence collapses, one doc-keyed join); the new work is ONE
    * map-side-combined aggregate keyed by surface whose per-key width is
    * the entity vocabulary — `H = ln(T) − Σ n·ln(n) / T` folds in a
    * single pass, no per-surface explode or window. */
  def aliasAmbiguity(unlinked: DataFrame, linked: DataFrame): DataFrame = {
    val ds = unlinked
      .select(col("doc_id"), lower(trim(col("surface"))).as("surface"))
      .distinct()
    val de = linked.select(col("doc_id"), col("entity_id")).distinct()
    ds.join(de, "doc_id")
      .groupBy(col("surface"), col("entity_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy("surface")
      .agg(
        count(lit(1)).as("n_entities"),
        sum(col("n")).as("n_docs_total"),
        max(col("n")).as("n_top"),
        sum(col("n") * log(col("n"))).as("__sl"))
      .select(col("surface"), col("n_entities"), col("n_docs_total"),
        round(col("n_top") / col("n_docs_total"), 4).as("top_share"),
        round(log(col("n_docs_total")) - col("__sl") / col("n_docs_total"), 4)
          .as("entropy"))
  }

  /** Generic salted equi-join for skewed keys: the big (probe) side gets a
    * deterministic salt in `[0, saltFactor)`, the small (build) side is
    * exploded over every salt value, and the join key becomes
    * `(key, salt)` — splitting each hot key's rows across `saltFactor`
    * shuffle partitions. Semantically identical to `big.join(small, keys)`
    * (inner); the equality is oracle-checked by `q08_salted_join`.
    *
    * `saltExpr` must be deterministic (north rule: reruns are byte-stable) —
    * pass e.g. `pmod(hash(col("some_big_side_col")), lit(saltFactor))`.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      saltExpr: Column,
      saltFactor: Int): DataFrame = {
    val bigSalted = big.withColumn("__salt", saltExpr.cast("int"))
    val smallExploded = small.withColumn(
      "__salt", explode(array((0 until saltFactor).map(lit): _*)))
    bigSalted
      .join(smallExploded,
        bigSalted(bigKey) === smallExploded(smallKey) &&
          bigSalted("__salt") === smallExploded("__salt"))
      .drop("__salt")
  }

  /** Static-dictionary disambiguation, precomputed driver-side: when the
    * candidate score depends only on the alias (a prior), the top-1 choice
    * per mention is the top-1 per ALIAS — computable once on the
    * dictionary, broadcast, and joined with no window and no extra shuffle.
    * This is the 100 TB path; [[disambiguate]] below is the general form
    * for context-dependent scores. */
  def winnersPerAlias(aliases: Seq[(String, String, Double)]): Seq[(String, String, Double)] =
    aliases.groupBy(_._1).map { case (_, group) =>
      group.minBy { case (_, e, s) => (-s, e) }
    }.toSeq.sortBy(_._1)

  /** Disambiguation: among a mention's candidate entities keep the top-1 by
    * (score desc, entity_id asc) — `row_number` over a per-mention window
    * (SURVEY.md §2 "window functions" note). Deterministic tie-break. */
  def disambiguate(candidates: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window
      .partitionBy("doc_id", "category", "surface", "begin_c")
      .orderBy(desc("score"), asc("entity_id"))
    candidates
      .filter(col("entity_id").isNotNull)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** The category → predicate mapping as ONE shared Column expression (a
    * null-defaulted CASE ladder over `category`): the single definition
    * [[triples]] and [[SameAs.collapseFacts]] both fold facts through,
    * so a mapping fix can never drift between the direct and the
    * cluster-collapsed KG paths. Unmapped categories yield null — the
    * caller filters. */
  def predColumn(predicates: Map[String, String]): org.apache.spark.sql.Column =
    predicates.foldLeft(lit(null).cast("string")) {
      case (acc, (cat, pred)) => when(col("category") === cat, lit(pred)).otherwise(acc)
    }

  /** Materialize distinct `(subj, pred, obj)` triples with doc lineage:
    * subj = linked entity, pred = category-mapped predicate, obj = document
    * URI. Distinct collapses multi-occurrence mentions (set semantics —
    * mirrors the reference's pair dedup at `ai/extractor_ner.py:100`). */
  def triples(linked: DataFrame, predicates: Map[String, String]): DataFrame =
    linked
      .select(
        col("entity_id").as("subj"),
        predColumn(predicates).as("pred"),
        concat(lit("doc://"), col("doc_id").cast("string")).as("obj"))
      .filter(col("pred").isNotNull)
      .distinct()
}
