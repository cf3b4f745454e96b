package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.annotate.{MentionExtractor, Prompts, TogetherAnnotator}
import graft.core.Category
import org.scalatest.funsuite.AnyFunSuite

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

/** Together-shaped production annotator (ref `ai/llm.py:104-144`): an
  * in-process stub plays the hosted OpenAI-contract endpoint so the
  * client's request shape, bearer auth, per-JVM throttle, and 429
  * Retry-After handling are exercised without any network. */
class TogetherAnnotatorSpec extends AnyFunSuite {

  private val Cats = Seq(Category("TOOL", "tools"), Category("OPERATION", "ops"))
  private val Sys = Prompts.systemPrompt("en", Cats)

  /** Stub server; handler gets (authHeader, requestBodyJson) and returns
    * Right(completion) → 200 OpenAI-shaped body, or Left(status →
    * optional Retry-After seconds) for an error. Records arrival nanos. */
  private def withServer(handler: (String, String) => Either[(Int, Option[Long]), String])(
      f: (String, () => Seq[Long]) => Unit): Unit = {
    val arrivals = scala.collection.mutable.ArrayBuffer.empty[Long]
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/chat/completions", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        arrivals.synchronized { arrivals += System.nanoTime() }
        val auth = Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        handler(auth, body) match {
          case Right(completion) =>
            val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
            val root = mapper.createObjectNode()
            root.putArray("choices").addObject()
              .putObject("message").put("role", "assistant").put("content", completion)
            val out = mapper.writeValueAsBytes(root)
            ex.sendResponseHeaders(200, out.length)
            ex.getResponseBody.write(out)
          case Left((status, retryAfter)) =>
            retryAfter.foreach(s =>
              ex.getResponseHeaders.set("Retry-After", s.toString))
            ex.sendResponseHeaders(status, -1)
        }
        ex.close()
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/v1/chat/completions",
      () => arrivals.synchronized(arrivals.toSeq))
    finally server.stop(0)
  }

  test("sends the Together contract (bearer auth, temperature 0, chat messages) and grounds") {
    var seen: (String, String) = null
    withServer { (auth, body) =>
      seen = (auth, body); Right("<TOOL>:spark\n<OPERATION>:merge")
    } { (url, _) =>
      val ann = TogetherAnnotator(url, apiKey = "k-secret",
        timeout = java.time.Duration.ofSeconds(5), minIntervalMillis = 0L)
      val ms = MentionExtractor.extract(ann, Sys, Cats, "run spark then merge")
      assert(ms.map(m => (m.category, m.surface)) ==
        Seq(("TOOL", "spark"), ("OPERATION", "merge")))
      assert(seen._1 == "Bearer k-secret")
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(seen._2)
      assert(node.get("model").asText ==
        "meta-llama/Llama-3.3-70B-Instruct-Turbo-Free") // llm.py:11
      assert(node.get("temperature").asInt == 0) // llm.py:116
      assert(node.get("messages").get(0).get("role").asText == "system")
      assert(node.get("messages").get(1).get("role").asText == "user")
      assert(node.get("messages").get(1).get("content").asText == "run spark then merge")
    }
  }

  test("per-JVM throttle spaces request departures by minIntervalMillis") {
    withServer { (_, _) => Right("None") } { (url, arrivals) =>
      val ann = TogetherAnnotator(url, apiKey = "k",
        timeout = java.time.Duration.ofSeconds(5), minIntervalMillis = 150L)
      (1 to 3).foreach(_ => ann.generateChecked(Sys, "x"))
      val ts = arrivals()
      assert(ts.size == 3)
      // 3 calls ⇒ ≥ 2 full intervals between first and last departure
      // (scheduling slack only ADDS time; 0.9 tolerates timer coarseness)
      assert((ts.last - ts.head) / 1e6 >= 2 * 150 * 0.9,
        s"arrivals spaced ${(ts.last - ts.head) / 1e6} ms")
    }
  }

  test("429 honors Retry-After before the retry, then succeeds") {
    val calls = new AtomicInteger(0)
    withServer { (_, _) =>
      if (calls.incrementAndGet() == 1) Left((429, Some(1L)))
      else Right("<TOOL>:spark")
    } { (url, arrivals) =>
      val ann = TogetherAnnotator(url, apiKey = "k",
        timeout = java.time.Duration.ofSeconds(5),
        maxRetries = 2, minIntervalMillis = 0L)
      val (resp, failed) = ann.generateChecked(Sys, "spark")
      assert(!failed && resp == "<TOOL>:spark" && calls.get() == 2)
      val ts = arrivals()
      assert((ts(1) - ts(0)) / 1e6 >= 1000 * 0.9,
        s"retry arrived after ${(ts(1) - ts(0)) / 1e6} ms, before the cool-down")
    }
  }

  test("exhausted retries surface as a failed batch, not an exception") {
    withServer { (_, _) => Left((500, None)) } { (url, _) =>
      val ann = TogetherAnnotator(url, apiKey = "k",
        timeout = java.time.Duration.ofSeconds(5),
        maxRetries = 1, minIntervalMillis = 0L)
      val (resp, failed) = ann.generateChecked(Sys, "x")
      assert(failed && resp == "")
      val (ms, failedBatches) = MentionExtractor.extractWithStats(ann, Sys, Cats, "spark")
      assert(ms.isEmpty && failedBatches == 1)
    }
  }
}
