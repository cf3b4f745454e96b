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
      (1 to 4).foreach(_ => ann.generateChecked(Sys, "x"))
      val ts = arrivals()
      assert(ts.size == 4)
      // departures are what the throttle spaces; arrivals measure them with
      // send latency added. The FIRST send absorbs ~100 ms of cold client
      // init, arriving late and shrinking the first gap — so assert over
      // the warm calls (2..4): ≥ 2 full intervals (scheduling slack only
      // ADDS time; 0.9 tolerates timer coarseness)
      assert((ts(3) - ts(1)) / 1e6 >= 2 * 150 * 0.9,
        s"arrivals spaced ${(ts(3) - ts(1)) / 1e6} ms")
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

  test("toString redacts the bearer token (task logs print closure fields)") {
    val ann = TogetherAnnotator("http://x/v1/chat/completions",
      apiKey = "sk-very-secret-token")
    assert(!ann.toString.contains("sk-very-secret-token"))
    assert(ann.toString.contains("apiKey=***"))
  }

  test("cluster-global budget: each of N workers spaces by N x interval, aggregate under limit") {
    // two simulated worker JVMs (distinct clock keys), workers=2, global
    // interval 120 ms → each worker must space its own departures by
    // ≥ 240 ms, so the sustained aggregate never exceeds 1/120ms
    val arrivals = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    withServer { (auth, _) =>
      arrivals.synchronized { arrivals += ((auth, System.nanoTime())) }
      Right("None")
    } { (url, _) =>
      def worker(key: String) = TogetherAnnotator(url, apiKey = key,
        timeout = java.time.Duration.ofSeconds(5),
        minIntervalMillis = 120L, workers = 2, clockKey = key)
      val threads = Seq("w1", "w2").map { key =>
        new Thread(() => {
          val ann = worker(key)
          (1 to 4).foreach(_ => ann.generateChecked(Sys, "x"))
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      val byWorker = arrivals.synchronized(arrivals.toSeq)
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      assert(byWorker.keySet == Set("Bearer w1", "Bearer w2"))
      byWorker.foreach { case (w, ts) =>
        assert(ts.size == 4)
        // each worker's first send absorbs cold client init (arrives late,
        // shrinking the first measured gap) — assert over its warm calls:
        // 3 departures ⇒ ≥ 2 full 240 ms shares
        assert((ts(3) - ts(1)) / 1e6 >= 2 * 240 * 0.9,
          s"$w spaced ${(ts(3) - ts(1)) / 1e6} ms — budget multiplied")
      }
    }
  }

  test("distinct clock keys are independent; shared key serializes across instances") {
    // distinct keys: both reservations depart immediately (no shared clock)
    val t0 = System.nanoTime()
    val a = TogetherAnnotator.reserveSlot(500L, "iso-a")
    val b = TogetherAnnotator.reserveSlot(500L, "iso-b")
    assert((a - t0) / 1e6 < 100 && (b - t0) / 1e6 < 100)
    // same key: the second reservation lands one interval later even from
    // a different annotator instance (per-JVM, not per-instance, state)
    val c1 = TogetherAnnotator.reserveSlot(500L, "iso-c")
    val c2 = TogetherAnnotator.reserveSlot(500L, "iso-c")
    assert((c2 - c1) / 1e6 >= 500 * 0.99)
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
