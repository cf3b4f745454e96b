package graft.streaming

import graft.annotate.{Annotator, DictAnnotator, MentionExtractor, Prompts}
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
  *
  * Feature parity with the batch pipeline: the annotator is pluggable
  * (an [[graft.annotate.HttpAnnotator]] binds a model server, default is
  * the deterministic [[DictAnnotator]]), `sentences_per_call` batching is
  * honored, and per-page `failed_batches` lineage is carried on
  * [[annotatedPages]] — sink those columns beside the triples to get the
  * batch path's metrics table, incrementally.
  *
  * NEAR-duplicate suppression is deliberately BATCH-ONLY
  * ([[graft.dedup.Dedup.clusters]] / `KgPipeline.Config.dedupNear`), by
  * design rather than omission. The watermark state model fits EXACT
  * streaming dedup because equality state for a key can be dropped once
  * the watermark passes it; LSH near-dup state is the (band, bucket) →
  * members map of the WHOLE corpus — a mirror page arriving a month after
  * its original must still collide, so no event-time bound can expire the
  * state without changing the semantics. A watermark-bounded variant
  * (flatMap pages to their 16 band keys, suppress a page whose ANY band
  * bucket was seen inside the horizon) is expressible with
  * `dropDuplicatesWithinWatermark`, but it computes "first-wins within a
  * time horizon", not cluster collapse with a deterministic winner — and
  * the winner rule is the part resume/byte-stability depend on. The
  * production composition is the one the batch side ships: stream with
  * exact watermarked dedup, then run the cluster collapse as a periodic
  * maintenance job over the landed corpus (the [[graft.sinks.Compact]]
  * cadence), where the pair graph and components are computed over all
  * data at rest.
  */
object StreamingKg {

  /** Continuous WARC ingestion — the crawl-queue pattern: the stream is a
    * MANIFEST of archive paths (one per line, appended as archives land;
    * file-stream text source), and each task opens its paths through the
    * Hadoop FileSystem and parses the records (plain or `.warc.gz`). This
    * sidesteps the binary file source's lack of streaming support, and
    * matches how production crawl ingestion actually arrives (a queue of
    * finished archive names, not a stream of record bytes). One task per
    * manifest line ⇒ per-file parallelism, same as the batch
    * [[graft.sources.Warc.read]] shape.
    *
    * The session's Hadoop configuration is broadcast to the tasks (the
    * `FileSourceScanExec` pattern) so `spark.hadoop.*` settings — S3
    * credentials, filesystem overrides — reach the executor-side opens; a
    * bare `new Configuration()` would silently drop them.
    *
    * Output columns match [[triplesStream]]'s input contract: `url`,
    * `warc_ts` (parsed from `WARC-Date`), `text` (engine-extracted from
    * the response html, ONCE — html itself is deliberately not emitted,
    * see [[annotatedPages]]'s annotation-input rule), `lang`. Crawls carry
    * no language tag, so `lang` is detected from the extracted text with
    * the engine's own trigram language-ID ([[graft.quality.TextQuality
    * .detectLang]] — same semantics as the batch `langIdCol`);
    * `defaultLang` stands in only when detection returns "und". */
  def warcPages(spark: SparkSession, manifestDir: String,
      defaultLang: String = "en"): DataFrame = {
    import spark.implicits._
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf()))
    spark.readStream.text(manifestDir)
      .as[String].map(_.trim).filter(_.nonEmpty)
      .mapPartitions { paths =>
        val conf = confBc.value.value
        paths.flatMap { p =>
          val path = new org.apache.hadoop.fs.Path(p)
          val fs = path.getFileSystem(conf)
          val in = fs.open(path)
          val bytes =
            try org.apache.commons.io.IOUtils.toByteArray(in)
            finally in.close()
          graft.sources.Warc.parseRecordsAuto(bytes)
            .filter(r => r.warc_type == "response" && r.target_uri.nonEmpty)
            .map { r =>
              val ts = try java.sql.Timestamp.from(java.time.Instant.parse(r.warc_date))
                       catch { case _: Exception => new java.sql.Timestamp(0L) }
              val html = graft.sources.Warc.httpBody(r.payload)
              // extract ONCE: the text feeds language-ID here and mention
              // extraction downstream. html is deliberately NOT emitted —
              // annotatedPages re-extracts whenever raw html is present
              // (batch-pipeline parity), so carrying both would re-parse
              // every page, the dominant per-page ingest cost
              val text = graft.html.HtmlText.extract(html)
              val detected = graft.quality.TextQuality.detectLang(text)
              val lang = if (detected == "und") defaultLang else detected
              (r.target_uri, ts, text, lang)
            }
        }
      }
      .toDF("url", "warc_ts", "text", "lang")
  }

  /** Per-page annotation with lineage — the streaming analog of the batch
    * pipeline's docs/ stage: one row per page with its extracted mentions
    * and the `failed_batches` count the batch path records in its metrics
    * table (annotator failures are NOT silently dropped on the streaming
    * path either). Stateless narrow map; works on batch frames too. */
  def annotatedPages(spark: SparkSession, pages: DataFrame,
      dict: Seq[(String, String)] = NerSpark.Dict,
      annotator: Option[Annotator] = None,
      sentencesPerCall: Int = 0): DataFrame = {
    import spark.implicits._
    val sysPromptByLang = Seq("en", "es", "it")
      .map(l => l -> Prompts.systemPrompt(l, NerSpark.Categories)).toMap
    val catsLocal = NerSpark.Categories
    val dictLocal = dict
    val annotatorCfg = annotator
    val spc = sentencesPerCall

    // Annotation input rule, matching the batch pipeline exactly: when raw
    // html is present, annotate extract(html) — a stored text column that
    // disagrees with the html must change only the html_ok metric, never
    // the mentions (KgPipeline does the same). Sources that ship ONLY
    // extracted text ([[warcPages]], which extracts once at ingest and
    // deliberately omits html) provide text without html.
    val withText: org.apache.spark.sql.Dataset[(String, java.sql.Timestamp, String, String)] =
      if (pages.columns.contains("html"))
        pages.select($"url", $"warc_ts", $"html", $"lang")
          .as[(String, java.sql.Timestamp, Array[Byte], String)]
          .map { case (url, ts, html, lang) =>
            (url, ts, graft.html.HtmlText.extract(html), lang) }
      else
        pages.select($"url", $"warc_ts", $"text", $"lang")
          .as[(String, java.sql.Timestamp, String, String)]
    withText
      .mapPartitions { it =>
        val ann = annotatorCfg.getOrElse(DictAnnotator(dictLocal))
        it.map { case (url, ts, text, lang) =>
          val sys = sysPromptByLang.getOrElse(lang, sysPromptByLang("en"))
          val (ms, failed) = MentionExtractor
            .extractWithStats(ann, sys, catsLocal, text, spc)
          (url, ts, lang, ms.map(m => (m.category, m.surface)), ms.size, failed)
        }
      }
      .toDF("url", "warc_ts", "lang", "mentions", "n_mentions", "failed_batches")
  }

  /** Transform a (streaming or batch) pages DataFrame into triples.
    * @param annotator override the deterministic [[DictAnnotator]] — e.g.
    *        an [[graft.annotate.HttpAnnotator]]; must be serializable.
    * @param watermarkDelay how long out-of-order pages may lag the max
    *        observed `warc_ts` before their duplicate-suppression state may
    *        be dropped (streaming path only; batch dedup is exact). */
  def triplesStream(spark: SparkSession, pages: DataFrame,
      dict: Seq[(String, String)] = NerSpark.Dict,
      aliases: Seq[(String, String, Double)] = Kg.AliasesExtended,
      watermarkDelay: String = "10 minutes",
      annotator: Option[Annotator] = None,
      sentencesPerCall: Int = 0): DataFrame = {
    import spark.implicits._
    val mentions = annotatedPages(spark, pages, dict, annotator, sentencesPerCall)
      .select(col("url"), col("warc_ts"), explode(col("mentions")).as("m"))
      .select(col("url"), col("warc_ts"),
        col("m._1").as("category"), col("m._2").as("surface"))

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
