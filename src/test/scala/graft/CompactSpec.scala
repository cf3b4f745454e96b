package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Compaction: row preservation, bin-packing arithmetic, no-op idempotence,
  * and crash-remnant cleanup. */
class CompactSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-compact-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-compact-").toString
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    d
  }

  /** Remnant paths mirror Compact's hidden-sibling naming. */
  private def remnant(dir: String, kind: String): java.io.File = {
    val f = new java.io.File(dir)
    new java.io.File(f.getParentFile, s".${f.getName}.compact-$kind")
  }

  test("compaction bin-packs small files, preserves rows, and no-ops when met") {
    import spark.implicits._
    val dir = freshDir()
    val rows = (0L until 5000L).map(i => (i, s"doc $i body"))
    rows.toDF("id", "body").repartition(40).write.parquet(dir)

    val before = spark.read.parquet(dir)
    assert(before.inputFiles.length == 40)

    // huge target → everything packs into one file
    val s1 = graft.sinks.Compact.rewrite(spark, dir)
    assert(s1.compacted && s1.filesBefore == 40 && s1.filesAfter == 1)
    val after = spark.read.parquet(dir)
    assert(after.as[(Long, String)].collect().sortBy(_._1).toSeq ==
      rows.sortBy(_._1))

    // already compact → no-op, nothing rewritten
    val s2 = graft.sinks.Compact.rewrite(spark, dir)
    assert(!s2.compacted && s2.filesBefore == 1 && s2.filesAfter == 1)
  }

  test("target-size arithmetic: ceil(total/target) output files") {
    import spark.implicits._
    val dir = freshDir()
    (0L until 20000L).map(i => (i, f"padding-padding-padding-$i%08d"))
      .toDF("id", "body").repartition(32).write.parquet(dir)
    val total = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-")).map(_.length).sum
    // pick a target that lands strictly between 2 and 32 output files
    val target = total / 5
    val s = graft.sinks.Compact.rewrite(spark, dir, target)
    val expected = math.ceil(total.toDouble / target).toInt
    assert(s.compacted && s.filesAfter == expected,
      s"expected $expected files, got ${s.filesAfter}")
    assert(spark.read.parquet(dir).count() == 20000L)
  }

  test("crash between the two renames recovers: tmp with _SUCCESS is promoted") {
    import spark.implicits._
    val dir = freshDir()
    (0L until 200L).map(i => (i, i.toString)).toDF("id", "body")
      .repartition(10).write.parquet(dir)
    // simulate: compacted write finished, dir moved aside, process died
    // before tmp was renamed into place
    val f = new java.io.File(dir)
    (0L until 200L).map(i => (i, i.toString)).toDF("id", "body")
      .coalesce(1).write.parquet(remnant(dir, "tmp").getPath)
    org.apache.commons.io.FileUtils.moveDirectory(f, remnant(dir, "old"))
    val s = graft.sinks.Compact.rewrite(spark, dir)
    // tmp (complete, _SUCCESS) was promoted; already compact → no-op stats
    assert(!s.compacted && s.filesAfter == 1)
    assert(spark.read.parquet(dir).count() == 200L)
    assert(!remnant(dir, "old").exists())
  }

  test("crash before the tmp write finished recovers: original is restored") {
    import spark.implicits._
    val dir = freshDir()
    (0L until 150L).map(i => (i, i.toString)).toDF("id", "body")
      .repartition(10).write.parquet(dir)
    // simulate: dir moved aside, tmp incomplete (no _SUCCESS), process died
    org.apache.commons.io.FileUtils.moveDirectory(
      new java.io.File(dir), remnant(dir, "old"))
    remnant(dir, "tmp").mkdirs()
    new java.io.File(remnant(dir, "tmp"), "part-junk").createNewFile()
    val s = graft.sinks.Compact.rewrite(spark, dir)
    assert(s.compacted && s.filesBefore == 10 && s.filesAfter == 1)
    assert(spark.read.parquet(dir).count() == 150L)
  }

  test("stale crash remnants are cleared before compacting") {
    import spark.implicits._
    val dir = freshDir()
    (0L until 100L).map(i => (i, i.toString)).toDF("id", "body")
      .repartition(10).write.parquet(dir)
    // simulate a crash: leftover tmp and old dirs with junk
    remnant(dir, "tmp").mkdirs()
    new java.io.File(remnant(dir, "tmp"), "garbage").createNewFile()
    remnant(dir, "old").mkdirs()
    val s = graft.sinks.Compact.rewrite(spark, dir)
    assert(s.compacted && s.filesAfter == 1)
    assert(!remnant(dir, "tmp").exists())
    assert(!remnant(dir, "old").exists())
    assert(spark.read.parquet(dir).count() == 100L)
  }

  test("legacy visible-sibling remnants (old naming) still recover and clear") {
    import spark.implicits._
    val dir = freshDir()
    (0L until 120L).map(i => (i, i.toString)).toDF("id", "body")
      .repartition(6).write.parquet(dir)
    // crash under the PREVIOUS release's naming: data dir moved aside to
    // the visible sibling `<dir>.compact-old`, process died
    org.apache.commons.io.FileUtils.moveDirectory(
      new java.io.File(dir), new java.io.File(dir + ".compact-old"))
    val s = graft.sinks.Compact.rewrite(spark, dir)
    assert(s.compacted && s.filesBefore == 6 && s.filesAfter == 1)
    assert(spark.read.parquet(dir).count() == 120L)
    assert(!new java.io.File(dir + ".compact-old").exists())
    // stale legacy tmp beside an intact dir is cleared too
    new java.io.File(dir + ".compact-tmp").mkdirs()
    val s2 = graft.sinks.Compact.rewrite(spark, dir)
    assert(!s2.compacted)
    assert(!new java.io.File(dir + ".compact-tmp").exists())
  }

  test("sorted compaction clusters: per-file key ranges disjoint, rewrite even when count met") {
    import spark.implicits._
    val dir = freshDir()
    // keys scattered across files (i*7919 mod n is a permutation for prime
    // stride) so every input file spans nearly the full key range
    val n = 20000
    val rows = (0 until n).map(i => ((i.toLong * 7919L) % n, s"body $i"))
    rows.toDF("id", "body").repartition(20).write.parquet(dir)
    val targetBytes = math.max(1L,
      org.apache.commons.io.FileUtils.sizeOfDirectory(new java.io.File(dir)) / 4)

    val s = graft.sinks.Compact.rewrite(spark, dir, targetBytes, sortBy = Seq("id"))
    assert(s.compacted && s.filesAfter >= 3, s"expected >=3 clustered files, got $s")
    // per-file footer ranges must be pairwise disjoint — that is the whole
    // point of the sort mode: a key predicate then skips whole files
    val ranges = spark.read.parquet(dir).inputFiles.toSeq.map { f =>
      val r = spark.read.parquet(f)
        .agg(org.apache.spark.sql.functions.min("id"),
          org.apache.spark.sql.functions.max("id")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi < lo2, s"overlap in $ranges")
      case _ =>
    }
    assert(spark.read.parquet(dir).as[(Long, String)].collect().sortBy(_._1).toSeq
      == rows.sortBy(_._1))

    // count target already met — the sort mode must STILL rewrite (its
    // goal is layout); plain mode must still no-op
    val again = graft.sinks.Compact.rewrite(spark, dir, targetBytes, sortBy = Seq("id"))
    assert(again.compacted)
    val plain = graft.sinks.Compact.rewrite(spark, dir, targetBytes)
    assert(!plain.compacted)
  }

  test("z-order compaction bounds per-file ranges on BOTH keys; single-key sort does not") {
    import spark.implicits._
    // a 64×64 grid scattered across input files: every file spans nearly
    // the full range of both keys before clustering
    val n = 4096
    val rows = (0 until n).map { j =>
      val i = (j * 2719) % n // permutation (2719 coprime with 4096)
      (i % 64L, i / 64L, s"payload-$j%06d")
    }
    def spanRatios(dir: String): (Double, Double) = {
      val files = spark.read.parquet(dir).inputFiles.toSeq
      val spans = files.map { f =>
        val r = spark.read.parquet(f).agg(
          org.apache.spark.sql.functions.min("x"), org.apache.spark.sql.functions.max("x"),
          org.apache.spark.sql.functions.min("y"), org.apache.spark.sql.functions.max("y")).head()
        (r.getLong(1) - r.getLong(0), r.getLong(3) - r.getLong(2))
      }
      (spans.map(_._1).sum.toDouble / spans.size / 63.0,
        spans.map(_._2).sum.toDouble / spans.size / 63.0)
    }
    val zdir = freshDir()
    rows.toDF("x", "y", "body").repartition(16).write.parquet(zdir)
    val targetBytes = math.max(1L,
      org.apache.commons.io.FileUtils.sizeOfDirectory(new java.io.File(zdir)) / 16)
    val s = graft.sinks.Compact.rewrite(spark, zdir, targetBytes,
      sortBy = Seq("x", "y"))
    assert(s.compacted && s.filesAfter >= 8, s"got $s")
    val (zx, zy) = spanRatios(zdir)
    // each file must cover a small rectangle: both keys' average per-file
    // span well under the global range (16 z-blocks of a 64×64 grid are
    // ~16×16 rectangles ⇒ ratio ~0.25; 0.6 leaves block-boundary slack)
    assert(zx <= 0.6 && zy <= 0.6, f"z-order spans x=$zx%.2f y=$zy%.2f")
    // row preservation
    assert(spark.read.parquet(zdir).as[(Long, Long, String)].collect().sorted.toSeq
      == rows.sorted)

    // contrast: single-key sort bounds x but leaves y at ~full width —
    // the case that motivates the interleave
    val xdir = freshDir()
    rows.toDF("x", "y", "body").repartition(16).write.parquet(xdir)
    graft.sinks.Compact.rewrite(spark, xdir, targetBytes, sortBy = Seq("x"))
    val (sx, sy) = spanRatios(xdir)
    assert(sx <= 0.6, f"x-sort must bound x spans, got $sx%.2f")
    assert(sy >= 0.9, f"x-sort should leave y unbounded, got $sy%.2f")
  }

  test("zero part- files no-ops in every mode (sort mode must not scan an empty dir)") {
    val dir = freshDir()
    new java.io.File(dir).mkdirs()
    // a directory with no part- files (e.g. only a _SUCCESS from an empty
    // write) must return no-op stats, not throw unable-to-infer-schema
    new java.io.File(dir, "_SUCCESS").createNewFile()
    val plain = graft.sinks.Compact.rewrite(spark, dir)
    assert(plain == graft.sinks.Compact.Stats(0, 0, 0L, compacted = false))
    val sorted = graft.sinks.Compact.rewrite(spark, dir, sortBy = Seq("id"))
    assert(sorted == graft.sinks.Compact.Stats(0, 0, 0L, compacted = false))
  }

  test("partitioned compaction: per-partition rewrite of a bucket=N table, rows+partitions exact") {
    import spark.implicits._
    val dir = freshDir()
    // the pipeline's triples layout: partitionBy(bucket), files accreted
    // over several "runs" (appends) → many small files per partition
    val rows = (0L until 3000L).map(i => (i, s"triple $i", i % 4))
    (0 until 3).foreach { run =>
      rows.filter(_._1 % 3 == run).toDF("id", "payload", "bucket")
        .repartition(5)
        .write.mode("append").partitionBy("bucket").parquet(dir)
    }
    val before = spark.read.parquet(dir)
    assert(before.inputFiles.length >= 4 * 3 * 3) // ≥ files per part per run

    val stats = graft.sinks.Compact.rewritePartitioned(spark, dir)
    assert(stats.keySet == Set("bucket=0", "bucket=1", "bucket=2", "bucket=3"))
    assert(stats.values.forall(s => s.compacted && s.filesAfter == 1))
    val after = spark.read.parquet(dir)
    assert(after.inputFiles.length == 4)
    assert(after.select("id", "payload", "bucket")
      .as[(Long, String, Long)].collect().map(t => (t._1, t._2, t._3.toInt)).sorted.toSeq
      == rows.map(t => (t._1, t._2, t._3.toInt)).sortBy(_._1))
    // idempotent: second sweep is a no-op everywhere
    val s2 = graft.sinks.Compact.rewritePartitioned(spark, dir)
    assert(s2.values.forall(!_.compacted))

    // crash recovery mid-sweep: one partition vanished between the two
    // renames, leaving only its hidden old-dir remnant — the sweep must
    // restore bucket=2 (NOT compact the remnant as a bogus partition) and
    // a whole-table read mid-crash must not see remnant rows
    val p2 = new java.io.File(dir, "bucket=2")
    org.apache.commons.io.FileUtils.moveDirectory(
      p2, remnant(p2.getPath, "old"))
    assert(spark.read.parquet(dir).count() == 3000L - rows.count(_._3 == 2))
    val s3 = graft.sinks.Compact.rewritePartitioned(spark, dir)
    assert(s3.keySet == Set("bucket=0", "bucket=1", "bucket=2", "bucket=3"))
    assert(spark.read.parquet(dir).count() == 3000L)
    assert(!remnant(p2.getPath, "old").exists())
  }
}
