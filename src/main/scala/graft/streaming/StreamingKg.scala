package graft.streaming

import graft.annotate.{DictAnnotator, MentionExtractor, Prompts}
import graft.kg.{Kg, KgPipeline}
import graft.ner.NerSpark
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured-Streaming face of the KG pipeline: the same per-row logic
  * (HTML→text → mention extraction → broadcast winner-alias linking →
  * triples) expressed over a streaming DataFrame. The north rule's
  * incrementality is checkpoint-resume batch ([[KgPipeline]]); this variant
  * covers continuous ingestion (`readStream` on an arriving-pages directory
  * → append-mode triple stream). The per-row stages are stateless; the
  * trailing dedup is Spark's stateful streaming dedup, state-bounded by a
  * `warc_ts` watermark (`dropDuplicatesWithinWatermark`) on the streaming
  * path — without the bound, dedup state grows with the corpus forever.
  */
object StreamingKg {

  /** Continuous WARC ingestion — the crawl-queue pattern: the stream is a
    * MANIFEST of archive paths (one per line, appended as archives land;
    * file-stream text source), and each task opens its paths through the
    * Hadoop FileSystem and parses the records. This sidesteps the binary
    * file source's lack of streaming support, and matches how production
    * crawl ingestion actually arrives (a queue of finished archive names,
    * not a stream of record bytes). One task per manifest line ⇒ per-file
    * parallelism, same as the batch [[graft.sources.Warc.read]] shape.
    *
    * Output columns match [[triplesStream]]'s input contract: `url`,
    * `warc_ts` (parsed from `WARC-Date`), `html`, `lang` (crawls don't
    * carry a language tag; `defaultLang` stands in until a langid stage). */
  def warcPages(spark: SparkSession, manifestDir: String,
      defaultLang: String = "en"): DataFrame = {
    import spark.implicits._
    spark.readStream.text(manifestDir)
      .as[String].map(_.trim).filter(_.nonEmpty)
      .mapPartitions { paths =>
        val conf = new org.apache.hadoop.conf.Configuration()
        paths.flatMap { p =>
          val path = new org.apache.hadoop.fs.Path(p)
          val fs = path.getFileSystem(conf)
          val in = fs.open(path)
          val bytes =
            try org.apache.commons.io.IOUtils.toByteArray(in)
            finally in.close()
          graft.sources.Warc.parseRecords(bytes)
            .filter(r => r.warc_type == "response" && r.target_uri.nonEmpty)
            .map { r =>
              val ts = try java.sql.Timestamp.from(java.time.Instant.parse(r.warc_date))
                       catch { case _: Exception => new java.sql.Timestamp(0L) }
              (r.target_uri, ts, graft.sources.Warc.httpBody(r.payload))
            }
        }
      }
      .toDF("url", "warc_ts", "html")
      .withColumn("lang", lit(defaultLang))
  }

  /** Transform a (streaming or batch) pages DataFrame into triples.
    * @param watermarkDelay how long out-of-order pages may lag the max
    *        observed `warc_ts` before their duplicate-suppression state may
    *        be dropped (streaming path only; batch dedup is exact). */
  def triplesStream(spark: SparkSession, pages: DataFrame,
      dict: Seq[(String, String)] = NerSpark.Dict,
      aliases: Seq[(String, String, Double)] = Kg.AliasesExtended,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    import spark.implicits._
    val sysPromptByLang = Seq("en", "es", "it")
      .map(l => l -> Prompts.systemPrompt(l, NerSpark.Categories)).toMap
    val catsLocal = NerSpark.Categories
    val dictLocal = dict

    val mentions = pages
      .select($"url", $"warc_ts", $"html", $"lang")
      .as[(String, java.sql.Timestamp, Array[Byte], String)]
      .flatMap { case (url, ts, html, lang) =>
        val annotator = DictAnnotator(dictLocal)
        val text = graft.html.HtmlText.extract(html)
        val sys = sysPromptByLang.getOrElse(lang, sysPromptByLang("en"))
        MentionExtractor.extract(annotator, sys, catsLocal, text)
          .map(m => (url, ts, m.category, m.surface))
      }
      .toDF("url", "warc_ts", "category", "surface")

    val canon = KgPipeline.canonicalMap(aliases)
    val winners = Kg.winnersPerAlias(aliases)
      .map { case (a, e, s) => (a, canon.getOrElse(e, e), s) }
    val winnersDf = winners.toDF("alias", "entity_id", "score")

    val predCol = NerSpark.Predicates.foldLeft(lit(null).cast("string")) {
      case (acc, (cat, p)) => when(col("category") === cat, lit(p)).otherwise(acc)
    }
    val triples = mentions
      .join(broadcast(winnersDf), lower(trim(col("surface"))) === col("alias"), "inner")
      .select(col("entity_id").as("subj"), predCol.as("pred"),
        concat(lit("page://"), col("url")).as("obj"), col("warc_ts"))
      .filter(col("pred").isNotNull)
    val deduped =
      if (triples.isStreaming)
        triples.withWatermark("warc_ts", watermarkDelay)
          .dropDuplicatesWithinWatermark("subj", "pred", "obj")
      else triples.dropDuplicates("subj", "pred", "obj")
    deduped.select("subj", "pred", "obj")
  }
}
