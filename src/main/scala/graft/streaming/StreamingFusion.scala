package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming face of [[graft.kg.Fusion.majorityVote]]: claims arrive
  * continuously (crawl snapshots, re-extraction passes, new upstream
  * models) and each `(subj, pred)` item's canonical object must track the
  * vote incrementally instead of re-running the batch fold per snapshot.
  *
  * Semantics are EXACTLY the batch rule — distinct `(source, obj)` claims
  * per item, highest distinct-source support wins, ties to the smallest
  * object — so a batch replay over the same claims produces the same
  * winners (pinned by StreamingSpec parity).
  *
  * State model: per item, the distinct `(obj, source)` claim pairs seen so
  * far — bounded by |sources| × |objects-claimed|, NEVER by stream length
  * (re-assertions collapse into the set), the same bound that makes the
  * batch window safe on hot subjects. Unlike near-dup LSH state (which is
  * corpus-sized and deliberately batch-only, see [[StreamingKg]]), fusion
  * state is item-local and source-bounded, so it FITS the
  * `mapGroupsWithState` model with no watermark compromise: a claim
  * arriving a month late still lands on its item's state and can flip the
  * winner — which is the point of truth discovery over snapshots.
  *
  * Emitted `n_claims` is monotonically non-decreasing per item (claims are
  * only ever added), so in an update-mode sink the row with the highest
  * `n_claims` per item is the current winner — the property the parity
  * spec keys on.
  */
object StreamingFusion {

  /** One asserted claim. */
  final case class Claim(subj: String, pred: String, obj: String, source: String)

  /** Accumulated distinct claim pairs for one `(subj, pred)` item. */
  final case class ItemState(pairs: Seq[(String, String)])

  /** The current winner of one item, batch-schema-compatible with
    * [[graft.kg.Fusion.majorityVote]]'s output. */
  final case class Winner(subj: String, pred: String, obj: String,
      n_votes: Long, n_claims: Long, unanimous: Boolean)

  /** Incremental majority vote over a (streaming or batch) claim dataset.
    * Use `outputMode("update")`: each trigger re-emits only the items it
    * touched. */
  def winnersStream(claims: Dataset[Claim]): Dataset[Winner] = {
    import claims.sparkSession.implicits._
    claims
      .groupByKey(c => (c.subj, c.pred))
      .mapGroupsWithState[ItemState, Winner](GroupStateTimeout.NoTimeout) {
        case ((subj, pred), it,
            state: GroupState[ItemState]) =>
          val prev = state.getOption.map(_.pairs).getOrElse(Seq.empty)
          val pairs = (prev ++ it.map(c => (c.obj, c.source))).distinct
          state.update(ItemState(pairs))
          val votes = pairs.groupBy(_._1).view.mapValues(_.size.toLong)
          // highest support, then smallest object — the batch tie rule
          val (obj, n) = votes.toSeq.minBy { case (o, v) => (-v, o) }
          Winner(subj, pred, obj, n, pairs.size.toLong, n == pairs.size)
      }
  }
}
