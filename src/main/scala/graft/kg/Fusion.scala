package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Truth discovery over multi-source fact claims — the RESOLUTION step
  * that acts on what [[Ontology.functionalViolations]] only measures.
  * When N extraction sources (prompt versions, upstream models, crawl
  * snapshots) each assert an object for a single-valued `(subj, pred)`
  * item, the merged KG must pick ONE canonical object; majority vote is
  * the standard data-fusion baseline (Li et al., "Truth Finding on the
  * Deep Web", VLDB 2013 — VOTE — and Dong/Srivastava's data-fusion
  * survey), and the deterministic variant here is what a reproducible
  * pipeline ships: highest distinct-source support wins, ties broken by
  * the lexicographically smallest object.
  */
object Fusion {

  /** Resolve each `(subj, pred)` item to one canonical object by
    * majority vote over distinct source claims.
    *
    * Input `(subj, pred, obj, source)`; re-assertions of the same claim
    * by the same source are collapsed first, so a chatty source cannot
    * outvote the others. Output one row per `(subj, pred)`:
    * `(subj, pred, obj, n_votes, n_claims, unanimous)` where `n_votes`
    * counts the distinct sources backing the winning object, `n_claims`
    * the distinct `(source, obj)` claims on the item (equals the source
    * count when every source asserts a single object), and `unanimous`
    * is `n_votes == n_claims`.
    *
    * Scale shape: one exchange collapses claims (keyed by the full
    * claim, map-side combined — the vote count per object falls out of
    * the same aggregation), then one window over `(subj, pred)` picks
    * the winner and sums `n_claims` in the same partition pass. Hot
    * subjects cannot skew the window: its partition key is the fact
    * item, and an item carries at most one row per (source, object)
    * pair — source-count-bounded, never corpus-bounded.
    */
  def majorityVote(facts: DataFrame): DataFrame = {
    val votes = facts.select("subj", "pred", "obj", "source").distinct()
      .groupBy("subj", "pred", "obj")
      .agg(count(lit(1)).as("n_votes"))
    val item = Window.partitionBy("subj", "pred")
    val rank = item.orderBy(col("n_votes").desc, col("obj").asc)
    votes
      .withColumn("n_claims", sum(col("n_votes")).over(item))
      .withColumn("rn", row_number().over(rank))
      .filter(col("rn") === 1)
      .select(col("subj"), col("pred"), col("obj"), col("n_votes"),
        col("n_claims"), (col("n_votes") === col("n_claims")).as("unanimous"))
  }
}
