package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-cardinality sketch with INTEGER-EXACT registers
  * and estimate (Flajolet–Fuss–Gandouet–Meunier, AofA'07) — the
  * mergeable sketch behind every corpus-scale "how many distinct
  * tokens/urls/entities" dashboard, where an exact `count(DISTINCT)`
  * would shuffle the full key stream. The registers ARE the operator
  * output: they are what a pipeline persists and merges across corpus
  * shards (register-wise max — the same aggregate that builds them).
  *
  * Determinism contract: the hash is the shared md5 primitive (first
  * 15 hex chars → a 60-bit non-negative BIGINT, the [[graft.core
  * .Buckets]] formula widened), bucket = low 6 bits, and the rank is
  * derived from the REMAINING 54 bits via `55 − length(bin(w))` —
  * integer position of the highest set bit, no floats — capped at 31
  * so the harmonic fold `Σ 2^(31−reg)` stays an exact BIGINT sum
  * (messes with estimates only beyond ~2³¹ distinct keys per bucket,
  * far past this estimator's bias regime). The estimate is computed in
  * micros by one integer division — `α_micro·m²·2³¹ div Σ` — so both
  * engines fold identical operands end-to-end. No bias correction
  * branches: this is the raw HLL estimator, documented as such, which
  * keeps the cross-engine replay single-expression.
  *
  * Scale shape: one narrow map per key (hash → (bucket, rank)), one
  * 64-group map-side-combinable max — the sketch never materializes
  * the distinct key set, which is the entire point at 100 TB. */
object Hll {

  /** α·10⁶ for m = 64: 0.7213/(1 + 1.079/64), the standard constant —
    * fixed HERE so engine and oracle interpolate the same literal. */
  val AlphaMicro: Long = 709337L

  val Buckets: Int = 64

  /** The 64-row sketch `(bucket, register, est_micro)` over the
    * whitespace tokens of `textCol`: `register` = max rank observed in
    * the bucket (0 for an untouched bucket), `est_micro` = the raw HLL
    * cardinality estimate in micros, identical on every row. */
  def tokenSketch(spark: org.apache.spark.sql.SparkSession, docs: DataFrame,
      textCol: String = "text"): DataFrame = {
    val toks = docs
      .select(explode(split(trim(col(textCol)), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
    val h = conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long")
    val regs = toks
      .select((h % Buckets).as("bucket"),
        least(lit(31L), lit(55L) - length(bin(shiftright(h, 6)))).as("rank"))
      .groupBy("bucket").agg(max(col("rank")).as("register"))
    val full = spark.range(Buckets).select(col("id").as("bucket"))
      .join(regs, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("register"), lit(0L)).as("register"))
    withEstimate(full)
  }

  /** MERGE two sketches — register-wise max, the same aggregate that
    * builds a sketch, then re-estimate. The merge law (max over a
    * union of key streams = max of per-stream maxes) makes the merged
    * sketch EQUAL to the sketch of the combined corpus, exactly —
    * which is why shards can sketch independently and the q173 oracle
    * can check the merged output against the whole-corpus replay. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    withEstimate(a.select("bucket", "register")
      .unionByName(b.select("bucket", "register"))
      .groupBy("bucket").agg(max(col("register")).as("register")))

  /** The harmonic fold + raw estimate over a full 64-row register
    * relation. The fold rides an unpartitioned window — over exactly
    * the m = 64 register rows, so the single-task frame is a constant,
    * never a corpus funnel (and no 1-row cross join enters the plan). */
  private def withEstimate(full: DataFrame): DataFrame = {
    val numer = AlphaMicro * Buckets * Buckets // fits: ~2.9e9
    val w = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    full
      .withColumn("s",
        sum(expr("CAST(power(2, 31 - register) AS BIGINT)")).over(w))
      .withColumn("est_micro", expr(s"${numer}L * 2147483648L DIV s"))
      .drop("s")
  }
}
