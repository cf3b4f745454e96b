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
    * Iceberg `rewrite_data_files(strategy => 'sort')` / z-order-lite
    * analog): rows are range-partitioned on the key into the bin-packed
    * file count and sorted within each file, so every output file covers
    * a DISJOINT key range — parquet min/max footer stats then let any
    * later key-predicate scan skip whole files. This mode intentionally
    * pays ONE exchange (plain compaction stays narrow — moving bytes must
    * not shuffle; establishing an order is exactly the case that must)
    * and rewrites even when the file-count target is already met, because
    * its goal is layout, not count. */
  def rewrite(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024,
      sortBy: Option[String] = None): Stats = {
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
    val packed = sortBy match {
      case Some(key) =>
        val k = org.apache.spark.sql.functions.col(key)
        scan.repartitionByRange(target, k).sortWithinPartitions(k)
      case None => scan.coalesce(target)
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
      sortBy: Option[String] = None): Map[String, Stats] = {
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
