package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The ONE deterministic bucket primitive behind every corpus-assignment
  * operator: train/val/test split (q47), stratified sampling (q57), and the
  * decontamination train/eval partition (q56) all derive from the SAME
  * md5-prefix bucket so they can never drift apart — a doc assigned to
  * `test` by the split is, by construction, on the eval side of
  * decontamination and sampled under the test-stratum rate.
  *
  * Bucket = first 8 hex chars of md5(key) as base-16 → decimal, mod `mod`.
  * Pure narrow expression (no shuffle, no RNG state): any slice of the
  * corpus on any engine re-derives the identical assignment — the property
  * that makes splits reproducible across reruns, backfills, and engines.
  * The DuckDB oracle replays it verbatim as
  * `('0x' || substr(md5(key::varchar), 1, 8))::BIGINT % mod`.
  */
object Buckets {

  /** Deterministic bucket in `[0, mod)` from the stable document key. */
  def md5Bucket(key: Column, mod: Int): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("long") % mod

  /** Column-modulus variant for row-dependent fan choices (e.g. picking
    * a neighbor index mod the node's degree). Same formula, same oracle
    * replay; the mod column must be positive. */
  def md5Bucket(key: Column, mod: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("long") % mod
}
