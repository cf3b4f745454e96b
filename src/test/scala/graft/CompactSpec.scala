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
      .coalesce(1).write.parquet(dir + ".compact-tmp")
    org.apache.commons.io.FileUtils.moveDirectory(f, new java.io.File(dir + ".compact-old"))
    val s = graft.sinks.Compact.rewrite(spark, dir)
    // tmp (complete, _SUCCESS) was promoted; already compact → no-op stats
    assert(!s.compacted && s.filesAfter == 1)
    assert(spark.read.parquet(dir).count() == 200L)
    assert(!new java.io.File(dir + ".compact-old").exists())
  }

  test("crash before the tmp write finished recovers: original is restored") {
    import spark.implicits._
    val dir = freshDir()
    (0L until 150L).map(i => (i, i.toString)).toDF("id", "body")
      .repartition(10).write.parquet(dir)
    // simulate: dir moved aside, tmp incomplete (no _SUCCESS), process died
    org.apache.commons.io.FileUtils.moveDirectory(
      new java.io.File(dir), new java.io.File(dir + ".compact-old"))
    new java.io.File(dir + ".compact-tmp").mkdirs()
    new java.io.File(dir + ".compact-tmp/part-junk").createNewFile()
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
    new java.io.File(dir + ".compact-tmp").mkdirs()
    new java.io.File(dir + ".compact-tmp/garbage").createNewFile()
    new java.io.File(dir + ".compact-old").mkdirs()
    val s = graft.sinks.Compact.rewrite(spark, dir)
    assert(s.compacted && s.filesAfter == 1)
    assert(!new java.io.File(dir + ".compact-tmp").exists())
    assert(!new java.io.File(dir + ".compact-old").exists())
    assert(spark.read.parquet(dir).count() == 100L)
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

    val s = graft.sinks.Compact.rewrite(spark, dir, targetBytes, sortBy = Some("id"))
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
    val again = graft.sinks.Compact.rewrite(spark, dir, targetBytes, sortBy = Some("id"))
    assert(again.compacted)
    val plain = graft.sinks.Compact.rewrite(spark, dir, targetBytes)
    assert(!plain.compacted)
  }
}
