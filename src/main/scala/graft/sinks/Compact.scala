package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the table-maintenance operation every
  * continuously-appending pipeline needs (Iceberg `rewrite_data_files` /
  * Delta `OPTIMIZE` analog for the plain-parquet stand-in layout,
  * SURVEY.md §1.4). A resumable pipeline that commits per bucket per run
  * accretes files; at 100 TB the scan-planning and open-per-file cost of
  * millions of small files dominates reads long before data volume does.
  *
  * Design:
  *  - bin-pack to `ceil(totalBytes / targetBytes)` output files using
  *    `coalesce` — a NARROW repack (no exchange: compaction moves bytes,
  *    it must not pay a shuffle);
  *  - no-op when the directory already meets the target file count — safe
  *    to run on a schedule;
  *  - crash-safe swap: write to the hidden sibling `.<dir>.compact-tmp`
  *    + `_SUCCESS`, move the old dir aside (`.<dir>.compact-old`), rename
  *    tmp into place, then drop the old dir. A crash leaves either the
  *    intact original (tmp is ignored and re-created on the next run) or
  *    the intact compacted dir plus an old-dir remnant that the next run
  *    clears — never a half-written table. Remnants are dot-prefixed so
  *    Spark/Hadoop listings skip them: when `dir` is one partition of a
  *    partitioned table, a concurrent whole-table reader can never pick a
  *    remnant up as a bogus partition.
  */
object Compact {

  final case class Stats(filesBefore: Int, filesAfter: Int, bytes: Long,
      compacted: Boolean)

  /** Compacts the flat parquet directory at `dir`. Returns before/after
    * file counts. Row content is preserved exactly (spec-pinned).
    *
    * `sortBy` additionally establishes CLUSTERING while compacting (the
    * Iceberg `rewrite_data_files(strategy => 'sort' | 'zorder')` analog):
    * with ONE key, rows are range-partitioned on it into the bin-packed
    * file count and sorted within each file, so every output file covers
    * a DISJOINT key range — parquet min/max footer stats then let any
    * later key-predicate scan skip whole files. With TWO OR MORE (numeric)
    * keys, rows are clustered on the bit-interleaved Z-VALUE of the keys
    * (each key scaled to 16 bits by its global min/max): every output
    * file then covers a small HYPER-RECTANGLE of the key space, so
    * predicates on ANY of the keys skip files — a single-key sort leaves
    * the other keys' per-file ranges at full width. This mode
    * intentionally pays ONE exchange (plain compaction stays narrow —
    * moving bytes must not shuffle; establishing an order is exactly the
    * case that must) and rewrites even when the file-count target is
    * already met, because its goal is layout, not count. */
  def rewrite(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024,
      sortBy: Seq[String] = Nil): Stats = {
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val dirP = new Path(dir)
    // remnants are DOT-PREFIXED siblings: Spark/Hadoop listings skip
    // hidden dirs, so when `dir` is one partition of a partitioned table
    // (rewritePartitioned) a concurrent whole-table read can never pick a
    // remnant up as a bogus partition, even mid-crash
    val tmp = new Path(dirP.getParent, s".${dirP.getName}.compact-tmp")
    val old = new Path(dirP.getParent, s".${dirP.getName}.compact-old")
    // one-time migration: earlier releases wrote remnants as VISIBLE
    // siblings (`<dir>.compact-*`); a table that crashed under that
    // naming must still recover, and its stale remnants must still clear
    val legacyTmp = new Path(dir + ".compact-tmp")
    val legacyOld = new Path(dir + ".compact-old")
    // Crash recovery BEFORE touching any remnant: a previous run may have
    // died between the two renames, leaving the data dir absent while the
    // only surviving copies are tmp (complete iff _SUCCESS) and/or old.
    // Deleting remnants first would destroy the last copy of the table.
    if (!fs.exists(dirP)) {
      if (fs.exists(new Path(tmp, "_SUCCESS"))) {
        require(fs.rename(tmp, dirP), s"could not promote $tmp to $dir")
      } else if (fs.exists(old)) {
        require(fs.rename(old, dirP), s"could not restore $old to $dir")
      } else if (fs.exists(new Path(legacyTmp, "_SUCCESS"))) {
        require(fs.rename(legacyTmp, dirP), s"could not promote $legacyTmp to $dir")
      } else if (fs.exists(legacyOld)) {
        require(fs.rename(legacyOld, dirP), s"could not restore $legacyOld to $dir")
      } else {
        throw new java.io.FileNotFoundException(
          s"$dir missing and no recoverable compaction remnant exists")
      }
    }
    // now the data dir is intact — remnants are stale and safe to clear
    // (old = swap finished but cleanup didn't; tmp = write never finished)
    Seq(old, tmp, legacyOld, legacyTmp).foreach(p =>
      if (fs.exists(p)) fs.delete(p, true))

    val parts = fs.listStatus(new Path(dir))
      .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
    val totalBytes = parts.map(_.getLen).sum
    val target = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    // zero part- files: nothing to rewrite in ANY mode — proceeding to the
    // scan would throw unable-to-infer-schema, and sort mode's
    // rewrite-even-at-target rule only applies to data that exists
    if (parts.isEmpty)
      return Stats(0, 0, 0L, compacted = false)
    if (parts.length <= target && sortBy.isEmpty)
      return Stats(parts.length, parts.length, totalBytes, compacted = false)

    // The scan itself groups small files into FilePartitions of up to
    // spark.sql.files.maxPartitionBytes — at the 128 MB default a pile of
    // tiny files collapses into FEWER partitions than the bin target, and
    // coalesce can only reduce. Scope the scan to (maxPartitionBytes =
    // targetBytes, openCost = 0) so it yields ≥ target partitions, then
    // coalesce down to exactly `target` — still a narrow repack end-to-end.
    // The overrides live in a CLONED session (own SQLConf, shared
    // SparkContext/catalog): mutating the caller's session conf would leak
    // the altered scan sizing into any query planned concurrently in the
    // same session, and made two concurrent rewrites unsafe.
    val scanSession = spark.newSession()
    scanSession.conf.set("spark.sql.files.maxPartitionBytes", targetBytes.toString)
    scanSession.conf.set("spark.sql.files.openCostInBytes", "0")
    val scan = scanSession.read.parquet(dir)
    import org.apache.spark.sql.functions.col
    val packed = sortBy match {
      case Nil => scan.coalesce(target)
      case Seq(key) =>
        scan.repartitionByRange(target, col(key)).sortWithinPartitions(col(key))
      case keys =>
        // the projection after the sort preserves within-partition order
        scan.withColumn("__z", zValue(scan, keys))
          .repartitionByRange(target, col("__z"))
          .sortWithinPartitions(col("__z"))
          .drop("__z")
    }
    packed.write.mode("overwrite").parquet(tmp.toString)
    require(fs.exists(new Path(tmp, "_SUCCESS")), s"compaction write to $tmp failed")
    require(fs.rename(new Path(dir), old), s"could not move $dir aside")
    require(fs.rename(tmp, new Path(dir)), s"could not activate $tmp")
    fs.delete(old, true)

    val after = fs.listStatus(new Path(dir))
      .count(f => f.isFile && f.getPath.getName.startsWith("part-"))
    Stats(parts.length, after, totalBytes, compacted = true)
  }

  /** Bit-interleaved z-value of up to 4 numeric key columns: each key is
    * scaled to 16 bits by its GLOBAL min/max (one tiny aggregate job over
    * the scan), then bit b of key i lands at position `b*n + i` — the
    * classic Morton code, built as a pure Catalyst expression (codegen'd,
    * ~64 shift/or ops; no UDF). Nulls sort first (scaled to 0). A key
    * whose min == max contributes nothing (constant 0 bits). */
  private def zValue(scan: org.apache.spark.sql.DataFrame,
      keys: Seq[String]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    require(keys.size <= 4, s"z-order interleave supports <= 4 keys, got $keys")
    val aggs = keys.flatMap(k => Seq(
      min(col(k).cast("double")), max(col(k).cast("double"))))
    val row = scan.agg(aggs.head, aggs.tail: _*).head()
    val n = keys.size
    val scaled = keys.zipWithIndex.map { case (k, i) =>
      // all-null key ⇒ no min/max ⇒ constant-0 contribution
      if (row.isNullAt(2 * i) || row.isNullAt(2 * i + 1)) lit(0L)
      else {
      val (lo, hi) = (row.getDouble(2 * i), row.getDouble(2 * i + 1))
      if (hi <= lo) lit(0L)
      else least(lit(65535L), greatest(lit(0L),
        floor((coalesce(col(k).cast("double"), lit(lo)) - lo)
          / (hi - lo) * 65536.0).cast("long")))
      }
    }
    (0 until 16).foldLeft(lit(0L)) { (acc, b) =>
      scaled.zipWithIndex.foldLeft(acc) { case (a, (s, i)) =>
        a.bitwiseOR(shiftleft(shiftright(s, b).bitwiseAND(lit(1L)), b * n + i))
      }
    }
  }

  /** Per-partition compaction of a `partitionBy(col)` table — the layout
    * the KG pipeline's `triples/` and `docs/` land in (`bucket=N/`
    * subdirectories), and the Iceberg `rewrite_data_files` reality: a
    * partitioned table is rewritten one partition at a time, so each
    * partition's swap stays independently crash-safe (a crash mid-sweep
    * leaves every partition either untouched or fully compacted — the
    * per-dir recovery logic of [[rewrite]] applies unchanged) and a
    * re-run skips partitions already at their target. Resumable pipelines
    * accrete files per run per bucket; at 100 TB the open-per-file cost
    * of millions of small files dominates reads — this is the scheduled
    * job that keeps that bounded. Returns per-partition stats keyed by
    * the partition directory name (e.g. `bucket=17`). */
  def rewritePartitioned(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024,
      sortBy: Seq[String] = Nil): Map[String, Stats] = {
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    // Partition names come from BOTH live dirs and crash remnants: a crash
    // between rewrite()'s two renames leaves `.p=X.compact-old`/`-tmp`
    // beside an ABSENT `p=X` — remnants are never compacted as partitions
    // (hidden dirs don't match the live filter; readers skip them too),
    // but the missing real partition must still be visited so rewrite()'s
    // own recovery branch restores it.
    val entries = fs.listStatus(new Path(dir)).filter(_.isDirectory)
    def isRemnant(n: String): Boolean =
      n.endsWith(".compact-old") || n.endsWith(".compact-tmp")
    val live = entries.map(_.getPath.getName)
      .filter(n => !n.startsWith(".") && n.contains("=") && !isRemnant(n))
    // remnants both hidden (current naming) and visible (legacy naming)
    val remnants = entries.map(_.getPath.getName)
      .filter(isRemnant)
      .map(_.stripPrefix(".").stripSuffix(".compact-old").stripSuffix(".compact-tmp"))
      .filter(_.contains("="))
    val names = (live ++ remnants).distinct.sorted
    names.map(n =>
      n -> rewrite(spark, new Path(dir, n).toString, targetBytes, sortBy)).toMap
  }
}
