package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT edit-distance-≤1 string similarity join via deletion-
  * neighborhood blocking (FastSS, Bocek et al. 2007) — the string-level
  * analog of [[graft.dedup.SetSim]]'s prefix filter: a candidate
  * generator that is COMPLETE by theorem, not probabilistic. The ER
  * counterpart of q79's order-keyed matcher for the regime where dirt
  * is a single character anywhere, not a known suffix pattern.
  *
  * Theorem (k = 1): lev(a, b) ≤ 1 ⟺ V(a) ∩ V(b) ≠ ∅, where
  * V(x) = {x} ∪ del1(x) (the string plus its one-character deletions)
  * — a substitution at i shares the delete-at-i variant, an insertion
  * shares the shorter string itself, equality shares the identity.
  * So ONE equi-join on the variant key yields every qualifying pair,
  * and the `levenshtein` verification only prunes false candidates
  * (strings at distance 2 whose deletions happen to collide — e.g.
  * transposed neighbors).
  *
  * Scale shape: |s|+1 variants per string from one codegen'd
  * `transform(sequence(...))` (no UDF), the candidate equi-join keys
  * on the variant (groups are deletion-bucket sized, never corpus
  * sized), and verification is the built-in codegen'd `levenshtein`
  * on the deduplicated pair set — an O(n·L) explode replacing the
  * O(n²) all-pairs scan a naive similarity join would shuffle. */
object EditJoin {

  /** Distinct `(a, b, dist)` pairs of `nameCol` values with
    * levenshtein distance exactly 1 (distinct values, so 0 cannot
    * occur), `a < b` canonically. */
  def pairs(names: DataFrame, nameCol: String): DataFrame = {
    val n = names.select(col(nameCol).as("name")).distinct()
    val v = n.select(col("name"), explode(array_distinct(concat(
        array(col("name")),
        expr("""transform(sequence(1, length(name)),
          i -> concat(substring(name, 1, i - 1),
                      substring(name, i + 1, length(name))))""")))))
      .toDF("name", "vr")
    // Verification BEFORE the distinct, with the BANDED levenshtein:
    // the threshold overload (Spark 3.5+) computes only the |k|≤1
    // diagonal band with early exit — O(L) per pair instead of O(L²) —
    // and returns −1 past the threshold, so `>= 0` is exactly the old
    // `<= 1` (distance for every kept row is the true distance).
    // Filtering first also shrinks the distinct's exchange to the
    // qualifying pairs only (measured at sf0.1: full-matrix lev on the
    // 977k candidates was ~5–6 s of the query's 7.3 s total; banded +
    // filter-first runs the whole query in ~2.5 s, OPTIMIZATION_r06).
    v.as("x").join(v.as("y"),
        col("x.vr") === col("y.vr") && col("x.name") < col("y.name"))
      .select(col("x.name").as("a"), col("y.name").as("b"))
      .withColumn("dist", levenshtein(col("a"), col("b"), 1).cast("long"))
      .filter(col("dist") >= 0)
      .distinct()
  }
}
