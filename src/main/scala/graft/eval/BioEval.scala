package graft.eval

import graft.core.{F1Metrics, TokenMetrics}

/** Token-level BIO evaluation — exact port of
  * `Pipeline.compute_instance_metrics` (reference `pipeline.py:42-100`) and
  * the zero-guarded P/R/F1 (`pipeline.py:102-123`).
  *
  * Scoring rules (per aligned token pair):
  *  - both "O"                               → nothing
  *  - same tag                               → tp += 1
  *  - same category, B vs I                  → tp += .5, fp += .5, fn += .5
  *  - different category (or malformed tag)  → fp += 1, fn += 1
  *  - gold-only                              → fn += 1; pred-only → fp += 1
  */
object BioEval {

  def computeInstanceMetrics(goldBio: Seq[String], predBio: Seq[String]): TokenMetrics = {
    if (goldBio.length != predBio.length)
      throw new AssertionError("Gold and predicted BIO sequences must have same length")

    var tp, fp, fn = 0.0
    var i = 0
    while (i < goldBio.length) {
      val gold = goldBio(i)
      val pred = predBio(i)
      if (gold == "O" && pred == "O") { /* skip */ }
      else if (gold != "O" && pred != "O") {
        val g = gold.split("-", 2)
        val p = pred.split("-", 2)
        if (g.length == 2 && p.length == 2 && g(1) == p(1)) {
          if (g(0) == p(0)) tp += 1
          else { tp += 0.5; fp += 0.5; fn += 0.5 }
        } else { fp += 1; fn += 1 }
      } else {
        if (gold != "O") fn += 1
        if (pred != "O") fp += 1
      }
      i += 1
    }
    TokenMetrics(tp, fp, fn)
  }

  def f1(tp: Double, fp: Double, fn: Double): F1Metrics = F1Metrics.from(tp, fp, fn)
}
