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
}
