package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Score-binned reliability table — the calibration diagram behind
  * every "is this classifier's 0.8 actually an 80%?" check
  * (Zadrozny–Elkan binning; the model-QA step a filtering pipeline
  * runs before trusting [[Classifier]]-style scores as sampling
  * weights). Fixed-width bins over [0, 1], per bin the support, the
  * mean predicted score, and the observed outcome rate: a calibrated
  * model tracks the diagonal, and the divergence per bin is the
  * correction a recalibration (Platt / isotonic) would learn.
  *
  * Fixed-width binning (not quantile) is deliberate: bin membership
  * is a pure per-row expression — `⌊score·B⌋` capped into the last
  * bin — so the table needs ONE map-side-combinable aggregate and no
  * boundary statistics pass; rates and means land as round-4 doubles
  * (the cross-engine float discipline). */
object Calibration {

  /** `(bin, n, mean_score, outcome_rate)` over `bins` fixed-width
    * score bins; `scoreCol` in [0, 1], `outcomeCol` boolean. */
  def table(df: DataFrame, scoreCol: String, outcomeCol: String,
      bins: Int): DataFrame = {
    require(bins >= 2, s"need >= 2 bins, got $bins")
    df.select(
        least(lit(bins - 1L),
          floor(col(scoreCol).cast("double") * bins)).cast("long").as("bin"),
        col(scoreCol).cast("double").as("s"),
        col(outcomeCol).cast("int").as("o"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        round(avg(col("s")), 4).as("mean_score"),
        round(avg(col("o")), 4).as("outcome_rate"))
  }
}
