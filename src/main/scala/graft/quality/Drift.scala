package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-sample Kolmogorov–Smirnov drift statistic between the value
  * distributions of two corpus slices: `D = max over x of
  * |F_left(x) − F_right(x)|`, the standard snapshot-over-snapshot
  * monitor a corpus pipeline runs on every refresh (did this crawl's
  * document-length / quality-score / token-count distribution move?).
  * Reporting the argmax `x` alongside `D` tells the operator WHERE the
  * distributions diverge — the actionable half of the alarm.
  *
  * Scale shape: the corpus collapses FIRST to one row per distinct
  * value with per-side counts (a two-phase map-side-combined
  * aggregate — the only pass over the data), so the CDF window runs
  * over `|distinct values|` rows, not corpus rows. For the discrete
  * measures drift monitors watch (lengths, token counts, bucketed
  * scores) that domain is bounded and tiny relative to the corpus; a
  * continuous measure gets quantile-bucketed upstream first (q95's
  * cutpoint pattern). The two side totals are a single 1-row aggregate
  * (the [[LmScore]] measured-gate discipline), and both engines
  * evaluate the CDF difference in IEEE double — same division, same
  * bits — so max/argmax agree exactly; ties on the max break to the
  * smallest x.
  */
object Drift {

  /** One row `(ks_at, ks_stat, n_left, n_right)`: the KS statistic
    * (rounded to 6) between the `value` distributions of the rows
    * where `side` = 0 (left) vs 1 (right), and the smallest value at
    * which the CDF gap attains it. Empty sides are refused — a KS
    * against nothing is a monitoring bug, not a zero. */
  def ks(df: DataFrame, side: Column, value: Column): DataFrame = {
    val perValue = df.select(side.as("side"), value.as("x"))
      .groupBy("x").agg(
        count(when(col("side") === 0, 1)).as("c_left"),
        count(when(col("side") === 1, 1)).as("c_right"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = perValue.agg(
      coalesce(sum("c_left"), lit(0L)), coalesce(sum("c_right"), lit(0L))).head()
    val (nL, nR) = (tot.getLong(0), tot.getLong(1))
    require(nL > 0 && nR > 0,
      s"KS needs both sides non-empty, got left=$nL right=$nR")
    // the CDF prefix sums order DISTINCT values — bounded domain by the
    // contract above, so the single-task window is k rows, not corpus rows
    val w = Window.orderBy("x")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perValue
      .select(col("x"),
        abs(sum("c_left").over(w).cast("double") / nL -
          sum("c_right").over(w).cast("double") / nR).as("gap"))
      .orderBy(col("gap").desc, col("x")).limit(1)
      .select(col("x").as("ks_at"), round(col("gap"), 6).as("ks_stat"),
        lit(nL).as("n_left"), lit(nR).as("n_right"))
  }
}
