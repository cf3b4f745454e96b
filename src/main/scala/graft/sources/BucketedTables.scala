package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed-table layout — the storage-side half of the co-located join.
  *
  * At 100 TB the dominant join cost is the exchange: a fact⋈fact equi join
  * shuffles both inputs end-to-end before a single row is joined. Writing
  * both tables `bucketBy(N, key)` (Spark's table-format analog of Iceberg
  * `bucket(N, key)` partition transforms — SURVEY.md §1.4) moves that
  * shuffle to WRITE TIME, once, amortized over every subsequent join and
  * aggregation on the key: the scan of a bucketed table reports
  * `HashPartitioning(key, N)`, so Catalyst plans a sort-merge join with NO
  * Exchange on either side (asserted by BucketedJoinSpec and visible in
  * PLANS.md). The KG pipeline already uses the same layout for its
  * shuffle-free extraction stage ([[graft.fixtures.WebTextGen
  * .pagesBucketed]]); this helper makes the layout available to the query
  * layer as catalog tables.
  *
  * One file per bucket (`repartition(N, key)` before the write — see the
  * round-1 small-files note) keeps the per-bucket sort usable and the
  * file count at N, not tasks×N.
  */
object BucketedTables {

  /** Per-PROCESS scratch root, removed on JVM exit. Bucket METADATA lives
    * in the session catalog so each process must re-issue the bucketed
    * saveAsTable anyway; keying the path by pid means two concurrent JVMs
    * (a verify run beside a bench, forked test JVMs) can never overwrite
    * the part files the other's scan is reading — a shared deterministic
    * path made that race possible. The shutdown hook keeps tmpfs bounded. */
  private lazy val procDir: String = {
    val d = s"${graft.core.TmpFs.base}/graft-bt-${ProcessHandle.current().pid()}"
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))))
    d
  }

  /** Creates catalog table `name` from `df` bucketed+sorted by `key` at an
    * external per-process path, or returns the existing one (idempotent
    * within a session — bench sweeps re-enter the same query). */
  def ensure(spark: SparkSession, name: String, df: => DataFrame, key: String,
      nBuckets: Int): DataFrame = {
    if (!spark.catalog.tableExists(name)) {
      df.repartition(nBuckets, col(key))
        .write
        .bucketBy(nBuckets, key)
        .sortBy(key)
        .option("path", s"$procDir/$name")
        .mode("overwrite")
        .saveAsTable(name)
    }
    spark.table(name)
  }

  /** The documents table re-written `partitionBy(lang)` — the identity-
    * partition pruning axis (Iceberg identity transform): a filter on
    * `lang` prunes whole directories at PLANNING time (`PartitionFilters`
    * in the scan, zero tasks for pruned partitions). Deterministic
    * location per (sf dir, source mtime+size) — the tag invalidates the
    * `_SUCCESS`-gated reuse if the source table is ever regenerated in
    * place; `repartition(lang)` first so the write emits one file per
    * partition value, not tasks×values (round-1 small-files note).
    * Populated through [[graft.core.TmpFs.ensureShared]] (per-pid staging
    * + atomic rename) so two cold-starting JVMs can never tear each
    * other's copy. */
  def partitionedDocsByLang(spark: SparkSession, sfDir: String): String = {
    val src = new java.io.File(s"$sfDir/documents.parquet")
    val tag = s"${src.lastModified}-${src.length}"
    val out = s"${graft.core.TmpFs.base}/graft-docs-bylang-" +
      s"${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}-$tag"
    graft.core.TmpFs.ensureShared(out) { staging =>
      spark.read.parquet(s"$sfDir/documents.parquet")
        .repartition(col("lang"))
        .write.mode("overwrite").partitionBy("lang").parquet(staging)
    }
  }
}
