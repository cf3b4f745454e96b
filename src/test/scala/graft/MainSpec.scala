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

  test("few-shot example reaches the executor-side system prompt via the engine API") {
    import spark.implicits._
    val docs = Seq((1L, "spark runs a hash join"), (2L, "plain text")).toDF("doc_id", "text")
    // an annotator gated on the example block: it answers ONLY when the
    // few-shot example is present in the system prompt — so a non-empty
    // result proves NerSpark.mentions threaded examplePrompt through
    // Prompts.systemPrompt into the task-side call, not just the driver
    val marker = "Example:\nInput: uses spark\nOutput:\n<TOOL>:spark"
    val gated = ExampleGatedAnnotator(graft.ner.NerSpark.Dict, marker)
    def run(example: Option[String]) =
      graft.ner.NerSpark.mentions(spark, docs,
        annotator = Some(gated), examplePrompt = example).collect()
    assert(run(Some(marker)).length == 2) // spark + hash join grounded
    assert(run(None).isEmpty)
    assert(run(Some("")).isEmpty) // Python truthiness: empty == no example
  }
}

/** Answers only when the system prompt carries the few-shot block —
  * top-level so the closure ships clean. */
final case class ExampleGatedAnnotator(dict: Seq[(String, String)], marker: String)
    extends graft.annotate.Annotator {
  override def generate(sys: String, user: String): String =
    if (sys.contains(marker)) graft.annotate.DictAnnotator(dict).generate(sys, user)
    else "None"
}
