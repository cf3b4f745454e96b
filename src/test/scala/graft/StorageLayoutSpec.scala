package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions for the storage-layout operators (q49/q50): the
  * whole point of bucketing and partitioning is what DISAPPEARS from the
  * physical plan (exchanges, scanned files), so these specs pin the plan,
  * not just the rows — row equivalence is the driver's DuckDB oracle. */
class StorageLayoutSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-layout-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("bucketed co-located join plans a sort-merge join with ZERO exchanges") {
    val df = SparkEntry.queries("q49_bucketed_join")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle either side:\n$plan")
    assert(df.count() == spark.read.parquet(s"$sf/documents.parquet").count())
  }

  test("aggregation on the bucket key also plans with zero exchanges") {
    val sfx = sf.replaceAll("[^A-Za-z0-9]", "_")
    val d = graft.sources.BucketedTables.ensure(spark, s"graft_docs_b$sfx",
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id", 8)
    val agg = d.groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.sum("n_chars").as("chars"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucket-key aggregation must not shuffle:\n$plan")
    assert(agg.count() == spark.read.parquet(s"$sf/documents.parquet").count())
  }

  test("bucketed table ensure() is idempotent within a session") {
    val sfx = sf.replaceAll("[^A-Za-z0-9]", "_")
    val t1 = graft.sources.BucketedTables.ensure(spark, s"graft_docs_b$sfx",
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id", 8)
    val files = t1.inputFiles.sorted.toSeq
    assert(files.size == 8, s"expected one file per bucket, got ${files.size}")
    val t2 = graft.sources.BucketedTables.ensure(spark, s"graft_docs_b$sfx",
      sys.error("must not be re-evaluated"), "doc_id", 8)
    assert(t2.inputFiles.sorted.toSeq == files)
  }

  test("partitionBy(lang) scan prunes to the filtered partition's files only") {
    val df = SparkEntry.queries("q50_partition_pruned")(spark, sf)
    // the lang predicate must land in the scan's PartitionFilters (planning-
    // time directory pruning), NOT as a post-scan data filter
    // sparkPlan (pre-AQE-wrapping) exposes the scan node directly
    val scans = df.queryExecution.sparkPlan.collectLeaves()
      .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
    assert(scans.nonEmpty)
    val scan = scans.head
    assert(scan.partitionFilters.exists(_.toString.contains("lang")),
      s"lang not in PartitionFilters: ${scan.partitionFilters}")
    // and the pruned file set is strictly the lang=en directory
    val selected = scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .flatMap(_.files).map(_.getPath.toString)
    assert(selected.nonEmpty && selected.forall(_.contains("lang=en")),
      s"unpruned files: ${selected.filterNot(_.contains("lang=en")).take(3)}")
    val expected = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("lang") === "en").groupBy("source").count().count()
    assert(df.count() == expected)
  }
}
