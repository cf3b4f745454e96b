package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The CLI face (reference `main.py` analog): gold-replay evaluation over a
  * real corpus must produce the reference's exact results-CSV columns with
  * micro P/R/F1 = 1.0 and macro = the docs-with-gold fraction (mention-free
  * docs score 0.0 under the reference's zero-division rule,
  * ref: pipeline.py:102-123). */
class MainSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-main-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("gold-replay CLI run writes a reference-shaped results row") {
    spark // ensure the shared session exists before Main's getOrCreate
    val out = java.nio.file.Files.createTempDirectory("graft-main-")
      .resolve("results.csv").toString
    Main.main(Array("--dataset", "multicardioner_track2_en",
      "--annotator", "gold", "--results", out, "--cpus", "4"))

    val lines = scala.io.Source.fromFile(out).getLines().toList
    assert(lines.length == 2)
    val row = lines.head.split(",").zip(lines(1).split(",")).toMap
    assert(row("dataset") == "multicardioner_track2_en")
    assert(row("model_name") == "graft-gold")
    assert(row("micro_f1").toDouble == 1.0)
    assert(row("micro_precision").toDouble == 1.0)

    // macro equals the fraction of docs that have >= 1 gold mention
    val corpus = graft.sources.Brat.Corpora
      .find(_.name == "multicardioner_track2_en").get
    val loaded = graft.sources.Brat.load(spark, corpus.dir, corpus.variant)
    val total = loaded.count().toDouble
    val withGold = loaded.filter(org.apache.spark.sql.functions.col("gold").isNotNull)
      .count().toDouble
    assert(math.abs(row("macro_f1").toDouble - withGold / total) < 1e-9)
  }
}
