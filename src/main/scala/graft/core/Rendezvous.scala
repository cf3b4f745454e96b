package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) assignment — Thaler–Ravishankar's
  * consistent shard routing: each key goes to the shard whose salted
  * hash of the key is highest, so adding or removing ONE shard moves
  * only the keys that hashed highest for it (~1/n of the space) and
  * every other assignment is untouched. The router a corpus pipeline
  * puts in front of per-shard state (annotator pools, embedding
  * services, dedup partitions) when consistent re-routing under
  * membership change matters — the stateful-service complement of
  * [[Buckets]]' fixed-mod split.
  *
  * The hash is the shared md5 primitive over `key || '#' || shard`,
  * and the argmax is ONE codegen'd `array_max` over a k-element
  * struct array ordered `(hash, shard)` — ties (2⁻³² per pair) break
  * to the larger shard name, the same rule the oracle's
  * `ORDER BY h DESC, shard DESC` replays. Pure narrow expression:
  * no shuffle, no join, any engine re-derives the identical routing
  * table — which is what makes shard membership auditable. */
object Rendezvous {

  private def salted(key: Column, shard: String): Column =
    Buckets.md5Bucket(concat(key.cast("string"), lit(s"#$shard")),
      1000000007)

  /** `(<keyCol>, shard)` — the HRW winner per input row. */
  def assign(df: DataFrame, keyCol: String, shards: Seq[String]): DataFrame = {
    require(shards.nonEmpty && shards.distinct.size == shards.size,
      "shards must be non-empty and distinct")
    val entries = shards.map(s =>
      struct(salted(col(keyCol), s).as("h"), lit(s).as("shard")))
    df.select(col(keyCol),
      array_max(array(entries: _*)).getField("shard").as("shard"))
  }
}
