package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Bloom-filter join pre-filtering (Bloom CACM'70; the
  * runtime-filter pass every warehouse engine ships as "bloom join" /
  * "runtime filter pushdown") — build a bit set from the small
  * (build) side's keys, probe the big side BEFORE its shuffle, and
  * let only bit-set members through to the real join. At 100 TB the
  * point is shuffle-byte elimination: probe rows that cannot match
  * never leave their scan task.
  *
  * Everything is exact-replayable: the `k` hash functions are the
  * shared md5 primitive salted with the hash index
  * ([[Buckets.md5Bucket]] over `key || '#' || i`), the filter is a
  * DISTINCT `(bit)` relation rather than opaque packed bytes — the
  * relational encoding of the bitmap, broadcast-joinable and
  * engine-replayable — and membership is "all k salted buckets
  * present", folded as one count-per-key aggregate. False positives
  * are DETERMINISTIC: the same keys produce the same phantom members
  * on every engine, which is what makes the operator oracle-testable
  * rather than merely statistically characterized.
  *
  * Scale shape: the build side folds to ≤ m rows (map-side combined
  * distinct); the probe explodes k rows per key, joins the broadcast
  * bit relation, and one map-side-combinable count==k gate follows —
  * no shuffle of the probe table beyond its own key aggregate, and in
  * a real plan that aggregate rides the join's existing exchange. */
object Bloom {

  private def bit(key: Column, i: Int, m: Int): Column =
    Buckets.md5Bucket(concat(key.cast("string"), lit(s"#$i")), m)

  /** The filter relation: DISTINCT `(bit)` positions set by `keys`'
    * `keyCol` under `k` salted hashes into `m` bits. */
  def build(keys: DataFrame, keyCol: String, m: Int, k: Int): DataFrame = {
    require(m > 0 && k >= 1, s"need m > 0, k >= 1; got $m, $k")
    keys.select(explode(array((0 until k).map(i =>
        bit(col(keyCol), i, m)): _*)).as("bit"))
      .distinct()
  }

  /** Probe: rows of `probe` whose `keyCol` passes the filter — every
    * one of the `k` salted buckets present in `bits`. Exact membership
    * for true keys, deterministic false positives for phantoms.
    * Implemented as k LEFT-SEMI joins against the (small, broadcast)
    * bit relation — row multiplicity of the probe is preserved
    * exactly, and a key whose salted hashes collide on one position
    * just checks that position twice. */
  def mightContain(probe: DataFrame, keyCol: String, bits: DataFrame,
      m: Int, k: Int): DataFrame =
    (0 until k).foldLeft(probe) { (d, i) =>
      d.join(broadcast(bits),
        bit(col(keyCol), i, m) === bits("bit"), "left_semi")
    }
}
