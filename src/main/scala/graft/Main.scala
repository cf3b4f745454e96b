package graft

import graft.annotate.{Annotator, HttpAnnotator}
import graft.core.Category
import graft.ner.NerSpark
import graft.sinks.CsvResults
import graft.sources.Brat
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Drop-in analog of the reference CLI (`ref: main.py:51-70`): evaluate an
  * annotator over a registered corpus and append one row to a results CSV
  * with the reference's exact column set (`ref: utils.py:35-43` —
  * model_name, dataset, paragraphs_per_call, micro_*, macro_*).
  *
  * ```
  * runMain graft.Main --dataset multicardioner_track2_en \
  *   [--datasets all] [--sentences-per-call K] \
  *   [--annotator gold|dict|http] [--host http://...] [--model NAME] \
  *   [--example "few-shot example block"] \
  *   [--results /path/results.csv] [--cpus N]
  * ```
  *
  * `--example` is the reference's `example_prompt` (`ref:
  * ai/extractor_ner.py:27-31`): a few-shot block appended to the system
  * prompt for the `dict`/`http` extraction modes.
  *
  * Annotators: `gold` replays the corpus gold as predictions — the
  * LLM-free mode that drives the full distributed dataflow (prompt
  * construction → extraction path for `dict`/`http`; join → BIO → token
  * metrics → aggregation for all modes) and must score micro/macro 1.0;
  * `dict` is the deterministic mock; `http` is the production
  * chat-completion client (`ref: ai/llm.py:17-76` semantics) — the mode a
  * reference user points at their model server.
  */
object Main {

  private def parseArgs(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap

  def main(args: Array[String]): Unit = {
    val opt = parseArgs(args)
    val datasets = opt.getOrElse("dataset", opt.getOrElse("datasets", "all")) match {
      case "all" => Brat.Corpora.map(_.name)
      case name  => Seq(name)
    }
    val spc = opt.getOrElse("sentences-per-call", "0").toInt
    val mode = opt.getOrElse("annotator", "gold")
    val model = opt.getOrElse("model",
      mode match { case "http" => "remote"; case m => s"graft-$m" })
    val results = opt.getOrElse("results", "results_graft.csv")
    val example = opt.get("example").filter(_.nonEmpty)
    val cpus = opt.getOrElse("cpus", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))

    // stop only a session this main itself created — embedders (tests, a
    // hosting app) keep theirs
    val hadSession = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession).isDefined
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-main")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // `--stats true`: the statistics_datasets.py analog (ref: :11-43)
    if (opt.contains("stats")) {
      Brat.statistics(spark).orderBy("dataset").show(false)
      if (!hadSession) spark.stop()
      return
    }

    datasets.foreach { name =>
      val corpus = Brat.Corpora.find(_.name == name)
        .getOrElse(sys.error(s"unknown dataset '$name'; known: " +
          Brat.Corpora.map(_.name).mkString(", ")))
      val loaded = Brat.load(spark, corpus.dir, corpus.variant, corpus.dropNoGold)
        // metrics/extraction key on a numeric doc id; the stem maps 1:1
        .withColumn("num_id", xxhash64(col("doc_id")))
      val docs = loaded.select(col("num_id").as("doc_id"), col("text"))
      val gold = loaded
        .select(col("num_id").as("doc_id"), explode(col("gold")).as("g"))
        .select(col("doc_id"), col("g.category").as("category"),
          col("g.surface").as("surface"),
          col("g.begin").as("begin_c"), col("g.end").as("end_c"))

      // the corpus's own label set parameterizes the prompt (the reference
      // defines these per dataset module; descriptions are configuration)
      val categories = gold.select("category").distinct()
        .collect().map(_.getString(0)).sorted
        .map(c => Category(c, s"Entities of type $c")).toSeq

      val pred: DataFrame = mode match {
        case "gold" => gold
        case "dict" =>
          NerSpark.mentions(spark, docs, lang = corpus.lang,
            sentencesPerCall = spc, examplePrompt = example)
        case "http" =>
          val annotator: Annotator = HttpAnnotator(
            endpoint = opt.getOrElse("host", "http://localhost:11434/api/chat"),
            model = model)
          NerSpark.mentions(spark, docs, categories = categories,
            lang = corpus.lang, sentencesPerCall = spc,
            annotator = Some(annotator), examplePrompt = example)
        case other => sys.error(s"unknown annotator '$other'")
      }

      val micro = NerSpark.microMetrics(spark, docs, gold, pred).head()
      val macroM = NerSpark.macroMetrics(spark, docs, gold, pred).head()
      CsvResults.append(results, Map(
        "model_name" -> model,
        "dataset" -> name,
        "paragraphs_per_call" -> spc.toString,
        "micro_precision" -> micro.getAs[Double]("precision").toString,
        "micro_recall" -> micro.getAs[Double]("recall").toString,
        "micro_f1" -> micro.getAs[Double]("f1").toString,
        "macro_precision" -> macroM.getAs[Double]("macro_precision").toString,
        "macro_recall" -> macroM.getAs[Double]("macro_recall").toString,
        "macro_f1" -> macroM.getAs[Double]("macro_f1").toString))
      println(f"[main] dataset=$name model=$model spc=$spc " +
        f"micro_f1=${micro.getAs[Double]("f1")}%.4f " +
        f"macro_f1=${macroM.getAs[Double]("macro_f1")}%.4f -> $results")
    }
    if (!hadSession) spark.stop()
  }
}
