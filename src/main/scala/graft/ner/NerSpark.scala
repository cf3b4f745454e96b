package graft.ner

import graft.annotate.{Annotator, DictAnnotator, MentionExtractor, Prompts}
import graft.core.{Category, Mention, TokenMetrics}
import graft.eval.BioEval
import graft.text.Tokenize
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed NER over a document table — the Spark lifecycle of the
  * reference's flagship run (SURVEY.md §3): scan → mapPartitions(batched
  * annotator, ops 5-13) → mentions table → BIO + token metrics (ops 14-18).
  *
  * The annotator is invoked once per document batch *inside* partitions
  * (reference batching knob `sentences_per_call`, `ai/extractor_ner.py:72-85`);
  * the system prompt is built once on the driver and captured by the closure
  * (broadcast-equivalent for a small string — reference builds it once per
  * call at `ai/extractor_ner.py:51-55`).
  */
object NerSpark {

  /** The engine's fixed demo dictionary over the synthetic `documents`
    * vocabulary (TESTDATA.md). Surfaces are chosen so substring grounding
    * equals whole-word matching (no surface is a substring of another vocab
    * word) and no two surfaces can overlap in text — which keeps BIO
    * token-overwrite out of play and the DuckDB oracle exact. */
  val Dict: Seq[(String, String)] = Seq(
    ("TOOL", "spark"),
    ("OPERATION", "hash join"),
    ("OPERATION", "table scan"),
    ("OPERATION", "merge"),
    ("OPERATION", "sort"),
    ("ACTOR", "customer"),
    ("DATA", "vector"),
    ("DATA", "stream"))

  val Categories: Seq[Category] = Seq(
    Category("TOOL", "Names of data-processing tools"),
    Category("OPERATION", "Names of relational operations"),
    Category("ACTOR", "Parties acting on data"),
    Category("DATA", "Kinds of data objects"))

  /** category → KG predicate for triple materialization (SURVEY.md §7 stage 3d). */
  val Predicates: Map[String, String] = Map(
    "TOOL" -> "uses_tool",
    "OPERATION" -> "performs",
    "ACTOR" -> "involves",
    "DATA" -> "consumes")

  /** Extract mentions for every document: `(doc_id, category, surface,
    * begin_c, end_c)`. Runs the full reference dataflow per row inside
    * `mapPartitions`; no shuffle — narrow transformation of the scan. */
  def mentions(
      spark: SparkSession,
      docs: DataFrame, // (doc_id LONG, text STRING)
      dict: Seq[(String, String)] = Dict,
      categories: Seq[Category] = Categories,
      lang: String = "en",
      sentencesPerCall: Int = 0,
      /** override the default deterministic [[DictAnnotator]] — e.g. an
        * [[graft.annotate.HttpAnnotator]]; must be serializable. */
      annotator: Option[Annotator] = None,
      /** few-shot example block appended to the system prompt — the
        * reference's `example_prompt` (`ai/extractor_ner.py:27-31`; Python
        * truthiness: an EMPTY example takes the no-example branch). */
      examplePrompt: Option[String] = None): DataFrame = {
    import spark.implicits._
    val sysPrompt = Prompts.systemPrompt(lang, categories, examplePrompt)
    val dictLocal = dict
    val catsLocal = categories
    val annotatorCfg = annotator
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val annotator: Annotator = annotatorCfg.getOrElse(DictAnnotator(dictLocal))
        it.flatMap { case (id, text) =>
          MentionExtractor.extract(annotator, sysPrompt, catsLocal, text, sentencesPerCall)
            .map(m => (id, m.category, m.surface, m.begin, m.end))
        }
      }
      .toDF("doc_id", "category", "surface", "begin_c", "end_c")
  }

  /** Micro token-level metrics of `pred` vs `gold` mention tables over
    * `docs` — the distributed form of reference ops 14-17: per-doc BIO via a
    * typed map, token-pair scoring, then a partial+final sum aggregation
    * (Catalyst HashAggregate). Output: one row
    * `(tp, fp, fn, precision, recall, f1)`. */
  def microMetrics(
      spark: SparkSession,
      docs: DataFrame, // (doc_id, text)
      gold: DataFrame, // (doc_id, category, surface, begin_c, end_c)
      pred: DataFrame): DataFrame = {
    import spark.implicits._

    def agged(m: DataFrame, name: String): DataFrame =
      m.groupBy("doc_id")
        .agg(collect_list(struct(col("category"), col("surface"),
          col("begin_c"), col("end_c"))).as(name))

    val joined = docs.select(col("doc_id").cast("long"), col("text"))
      .join(agged(gold, "gold"), Seq("doc_id"), "left")
      .join(agged(pred, "pred"), Seq("doc_id"), "left")
      .select($"doc_id", $"text",
        coalesce($"gold", array()).as("gold"),
        coalesce($"pred", array()).as("pred"))
      .as[(Long, String, Seq[(String, String, Int, Int)], Seq[(String, String, Int, Int)])]

    val perDoc = joined.map { case (_, text, g, p) =>
      // collect_list order is nondeterministic — impose the reference's
      // begin-sorted order (extractor output, ai/extractor_ner.py:121)
      // before BIO overwrite is applied
      def toMentions(xs: Seq[(String, String, Int, Int)]): Seq[Mention] =
        xs.map { case (c, s, b, e) => Mention(c, s, b, e) }.sortBy(m => (m.begin, m.category, m.surface))
      val gb = Tokenize.bioTags(text, toMentions(g)).toSeq
      val pb = Tokenize.bioTags(text, toMentions(p)).toSeq
      val tm: TokenMetrics = BioEval.computeInstanceMetrics(gb, pb)
      (tm.tp, tm.fp, tm.fn)
    }.toDF("tp", "fp", "fn")

    perDoc.agg(sum("tp").as("tp"), sum("fp").as("fp"), sum("fn").as("fn"))
      .select($"tp", $"fp", $"fn",
        when($"tp" + $"fp" > 0, $"tp" / ($"tp" + $"fp")).otherwise(0.0).as("precision"),
        when($"tp" + $"fn" > 0, $"tp" / ($"tp" + $"fn")).otherwise(0.0).as("recall"))
      .select($"tp", $"fp", $"fn", $"precision", $"recall",
        when($"precision" + $"recall" > 0,
          lit(2.0) * $"precision" * $"recall" / ($"precision" + $"recall"))
          .otherwise(0.0).as("f1"))
  }

  /** Macro (per-document mean) metrics — reference op 18 (`pipeline.py:236-250`). */
  def macroMetrics(
      spark: SparkSession,
      docs: DataFrame,
      gold: DataFrame,
      pred: DataFrame): DataFrame = {
    import spark.implicits._
    def agged(m: DataFrame, name: String): DataFrame =
      m.groupBy("doc_id")
        .agg(collect_list(struct(col("category"), col("surface"),
          col("begin_c"), col("end_c"))).as(name))
    val joined = docs.select(col("doc_id").cast("long"), col("text"))
      .join(agged(gold, "gold"), Seq("doc_id"), "left")
      .join(agged(pred, "pred"), Seq("doc_id"), "left")
      .select($"doc_id", $"text",
        coalesce($"gold", array()).as("gold"),
        coalesce($"pred", array()).as("pred"))
      .as[(Long, String, Seq[(String, String, Int, Int)], Seq[(String, String, Int, Int)])]
    val perDoc = joined.map { case (_, text, g, p) =>
      def toMentions(xs: Seq[(String, String, Int, Int)]): Seq[Mention] =
        xs.map { case (c, s, b, e) => Mention(c, s, b, e) }.sortBy(m => (m.begin, m.category, m.surface))
      val tm = BioEval.computeInstanceMetrics(
        Tokenize.bioTags(text, toMentions(g)).toSeq,
        Tokenize.bioTags(text, toMentions(p)).toSeq)
      val f = BioEval.f1(tm.tp, tm.fp, tm.fn)
      (f.precision, f.recall, f.f1)
    }.toDF("precision", "recall", "f1")
    perDoc.agg(avg("precision").as("macro_precision"),
      avg("recall").as("macro_recall"), avg("f1").as("macro_f1"))
  }
}
