package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.annotate.{HttpAnnotator, MentionExtractor, Prompts}
import graft.core.Category
import graft.kg.KgPipeline
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

/** Production annotator binding: an in-process HTTP stub plays the model
  * server (the reference's Ollama daemon at `ai/llm.py:25-27`) so the
  * engine's chat-completion client — request shape, temperature-0 options,
  * retry, and `failed_batches` lineage — is exercised without any network.
  */
class HttpAnnotatorSpec extends AnyFunSuite {

  private val Cats = Seq(Category("TOOL", "tools"), Category("OPERATION", "ops"))
  private val Sys = Prompts.systemPrompt("en", Cats)

  /** Starts a stub server; handler gets (requestBodyJson) and returns
    * Some(completionText) for a 200 Ollama-shaped response or None for 500. */
  private def withServer(handler: String => Option[String])(f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/chat", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        handler(body) match {
          case Some(completion) =>
            val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
            val root = mapper.createObjectNode()
            root.putObject("message").put("role", "assistant").put("content", completion)
            val out = mapper.writeValueAsBytes(root)
            ex.sendResponseHeaders(200, out.length)
            ex.getResponseBody.write(out)
          case None =>
            ex.sendResponseHeaders(500, -1)
        }
        ex.close()
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/api/chat")
    finally server.stop(0)
  }

  test("sends reference-contract request and grounds the completion") {
    var seenBody: String = null
    withServer { body => seenBody = body; Some("<TOOL>:spark\n<OPERATION>:merge") } { url =>
      val ann = HttpAnnotator(url, "phi4", java.time.Duration.ofSeconds(5))
      val ms = MentionExtractor.extract(ann, Sys, Cats, "run spark then merge and spark")
      assert(ms.map(m => (m.category, m.surface, m.begin, m.end)) == Seq(
        ("TOOL", "spark", 4, 9), ("OPERATION", "merge", 15, 20), ("TOOL", "spark", 25, 30)))
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(seenBody)
      assert(node.get("model").asText == "phi4")
      assert(!node.get("stream").asBoolean)
      assert(node.get("options").get("temperature").asInt == 0) // llm.py:59
      assert(node.get("options").get("num_predict").asInt == 16384)
      assert(node.get("options").get("num_ctx").asInt == 4096)
      assert(node.get("messages").get(0).get("role").asText == "system")
      assert(node.get("messages").get(1).get("content").asText
        == "run spark then merge and spark")
    }
  }

  test("retries transient 500s up to maxRetries, then succeeds") {
    val calls = new AtomicInteger(0)
    withServer { _ =>
      if (calls.incrementAndGet() <= 2) None else Some("<TOOL>:spark")
    } { url =>
      val ann = HttpAnnotator(url, "m", java.time.Duration.ofSeconds(5), maxRetries = 2)
      val (resp, failed) = ann.generateChecked(Sys, "spark")
      assert(!failed && resp == "<TOOL>:spark" && calls.get() == 3)
    }
  }

  test("exhausted retries surface as a failed batch, not an exception") {
    val calls = new AtomicInteger(0)
    withServer { _ => calls.incrementAndGet(); None } { url =>
      val ann = HttpAnnotator(url, "m", java.time.Duration.ofSeconds(5), maxRetries = 1)
      val (resp, failed) = ann.generateChecked(Sys, "x")
      assert(failed && resp == "" && calls.get() == 2)
      // extract keeps the reference's empty-result semantics, plus the count
      val (ms, failedBatches) = MentionExtractor.extractWithStats(ann, Sys, Cats, "spark")
      assert(ms.isEmpty && failedBatches == 1)
    }
  }

  test("pipeline records failed_batches lineage in the metrics table") {
    lazy val spark: SparkSession = SparkSession.builder()
      .master("local[4]")
      .appName("graft-http-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // the stub annotates only batches mentioning "spark"; everything else
    // fails after retries → those docs must surface in failed_batches
    withServer { body =>
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
      val user = node.get("messages").get(1).get("content").asText
      if (user.contains("spark")) Some("<TOOL>:spark") else None
    } { url =>
      import spark.implicits._
      val out = java.nio.file.Files.createTempDirectory("graft-http-kg-").toString
      val pages = graft.fixtures.WebTextGen.pages(spark, 24, 2).toDF()
      val stats = KgPipeline.run(spark, pages, KgPipeline.Config(out, numBuckets = 4,
        annotator = Some(HttpAnnotator(url, "m",
          java.time.Duration.ofSeconds(5), maxRetries = 0))))
      val expectedFailures = graft.fixtures.WebTextGen.pages(spark, 24, 2)
        .collect().count(p => !p.text.contains("spark"))
      assert(stats.failedBatches == expectedFailures && expectedFailures > 0)
      val metricsSum = spark.read.parquet(s"$out/metrics")
        .agg(org.apache.spark.sql.functions.sum("failed_batches")).head().getLong(0)
      assert(metricsSum == expectedFailures)
      // docs whose only batch failed still produce a (mention-free) row
      assert(stats.docs == 24)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    }
  }
}
