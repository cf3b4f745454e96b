package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity resolution by sorted-neighborhood matching (Hernández & Stolfo
  * '95) — the scale-friendly alternative to blocking when no blocking key
  * is clean: sort ALL records by the match key, then compare each record
  * only against its `windowSize` sort-neighbors, scoring survivors with
  * edit distance. Comparison count is O(n·w) instead of the O(n²) of
  * naive pairing or the O(block²) blow-up a skewed blocking key causes
  * (every TPC-H-style name shares one prefix — prefix blocking would put
  * the whole table in one block).
  *
  * Scale shape: global ranks are computed WITHOUT a single-partition
  * window — a range-partitioned sort gives per-partition local ranks, and
  * a partition-count prefix sum (one row per partition, window over a
  * relation the size of the partition COUNT, not the data) lifts them to
  * global ranks. The neighbor pairing is then an equi-join on exploded
  * rank targets, so Catalyst plans hash joins — no cross product, no
  * theta join. `levenshtein` is a codegen'd built-in. Rank ties cannot
  * occur: the sort key is (key, rec_id), unique by construction.
  */
object ErMatch {

  /** `(rec_id, key)` → `(rec_id, key, rnk)` with a gap-free global rank
    * in (key, rec_id) order, computed distributed (see class doc). */
  def globalRank(records: DataFrame): DataFrame = {
    // partition count comes from spark.sql.shuffle.partitions (no .rdd
    // materialization); rank values are boundary-placement-independent,
    // so the sampler inside repartitionByRange can't affect the output
    val sorted = records
      .repartitionByRange(col("key"), col("rec_id"))
      .withColumn("pid", spark_partition_id())
    val local = sorted.withColumn("lrnk",
      row_number().over(
        Window.partitionBy("pid").orderBy(col("key"), col("rec_id"))))
    // offsets: one row per partition — broadcast-sized by construction
    val offsets = local.groupBy("pid").agg(count(lit(1)).as("n"))
      .withColumn("off",
        coalesce(sum(col("n")).over(
          Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("pid"), col("off"))
    local.join(broadcast(offsets), "pid")
      .select(col("rec_id"), col("key"), (col("lrnk") + col("off")).as("rnk"))
  }

  /** Blocking/matching evaluation — the three standard indexing metrics
    * (Christen, "A Survey of Indexing Techniques for Scalable Record
    * Linkage and Deduplication", TKDE 2012): pairs completeness
    * `TP / |gold|` (the recall blocking must not sacrifice), pairs
    * quality `TP / |candidates|` (precision of the emitted pairs), and
    * reduction ratio `1 − |candidates| / C(n, 2)` (how much of the naive
    * quadratic comparison space the method avoided — the reason
    * [[sortedNeighborhood]] exists). One row out.
    *
    * @param candidates `(id_a, id_b)` pairs the method emitted
    *                   (canonical `id_a < id_b`)
    * @param gold       `(id_a, id_b)` true duplicate pairs, same
    *                   canonical order
    * @param records    the full record set (its COUNT anchors the
    *                   reduction ratio's quadratic denominator)
    * @return `(n_records, n_candidates, n_gold, n_tp,
    *         pairs_completeness, pairs_quality, reduction_ratio)` —
    *         ratios rounded to 4
    *
    * Scale shape: candidate∩gold overlap is ONE full-outer equi-join on
    * the pair key; the three pair counts and the record count then fold
    * in ONE map-side-combined aggregate over a tagged union — scalars
    * never meet through a nested-loop join (the q94 single-aggregate
    * discipline). */
  def evalBlocking(candidates: DataFrame, gold: DataFrame,
      records: DataFrame): DataFrame = {
    val cand = candidates.select("id_a", "id_b").distinct()
    val g = gold.select("id_a", "id_b").distinct()
    val paired = cand.withColumn("in_c", lit(1L))
      .join(g.withColumn("in_g", lit(1L)), Seq("id_a", "id_b"), "full_outer")
      .select(coalesce(col("in_c"), lit(0L)).as("in_c"),
        coalesce(col("in_g"), lit(0L)).as("in_g"), lit(0L).as("is_rec"))
    paired
      .unionByName(records.select(lit(0L).as("in_c"), lit(0L).as("in_g"),
        lit(1L).as("is_rec")))
      .agg(
        sum(col("is_rec")).as("n_records"),
        sum(col("in_c")).as("n_candidates"),
        sum(col("in_g")).as("n_gold"),
        sum(col("in_c") * col("in_g")).as("n_tp"))
      .select(col("n_records"), col("n_candidates"), col("n_gold"),
        col("n_tp"),
        round(col("n_tp") / col("n_gold"), 4).as("pairs_completeness"),
        round(col("n_tp") / col("n_candidates"), 4).as("pairs_quality"),
        round(lit(1.0) - col("n_candidates") /
          (col("n_records") * (col("n_records") - 1) / 2.0), 4)
          .as("reduction_ratio"))
  }

  /** Match pairs `(id_a, id_b, key_a, key_b, dist)` between records whose
    * sort ranks differ by ≤ `windowSize` and whose keys sit within
    * `maxDist` edits; `id_a < id_b` canonically.
    *
    * @param records    `(rec_id, key)` rows — `rec_id` unique
    * @param windowSize sorted-neighborhood width (comparisons per record)
    * @param maxDist    maximum Levenshtein distance to emit
    */
  def sortedNeighborhood(records: DataFrame, windowSize: Int,
      maxDist: Int): DataFrame = {
    val ranked = globalRank(records)
    val probes = ranked.select(col("rec_id").as("id_a"),
        col("key").as("key_a"),
        explode(sequence(col("rnk") + 1, col("rnk") + windowSize))
          .as("rnk"))
    probes
      .join(ranked.select(col("rec_id").as("id_b"), col("key").as("key_b"),
        col("rnk")), "rnk")
      // BANDED levenshtein (threshold overload, Spark 3.5+): computes
      // only the |k|≤maxDist diagonal band and returns −1 past it, so
      // `>= 0` is exactly the old `<= maxDist` — and the distance is
      // computed ONCE instead of once in the filter and again in the
      // projection (the q164 lesson, OPTIMIZATION_r06)
      .withColumn("dist",
        levenshtein(col("key_a"), col("key_b"), maxDist))
      .filter(col("dist") >= 0)
      .select(
        least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        when(col("id_a") < col("id_b"), col("key_a")).otherwise(col("key_b"))
          .as("key_a"),
        when(col("id_a") < col("id_b"), col("key_b")).otherwise(col("key_a"))
          .as("key_b"),
        col("dist"))
  }
}
