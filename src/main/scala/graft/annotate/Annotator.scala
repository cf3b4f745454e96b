package graft.annotate

/** Pluggable annotator boundary — the reference's only external call is the
  * chat completion at `ai/llm.py:38-76` (Ollama, temperature 0, errors
  * swallowed to ""). In the engine this trait is invoked inside
  * `mapPartitions`; production would bind an HTTP client per partition,
  * tests and benches bind the deterministic [[DictAnnotator]] (mirroring the
  * mocked completions of reference `tests/test_extractor_ner.py:34-37`).
  *
  * Implementations MUST be serializable (shipped to executors) and pure
  * functions of their inputs (determinism is a north-rule requirement).
  */
trait Annotator extends Serializable {
  def generate(systemPrompt: String, userPrompt: String): String

  /** Like [[generate]] but with an explicit failure flag. The reference
    * swallows every error into `""` (`ai/llm.py:75-76`), silently losing the
    * batch; the engine instead surfaces failures as a `failed_batches`
    * lineage count (SURVEY §4). Deterministic annotators never fail. */
  def generateChecked(systemPrompt: String, userPrompt: String): (String, Boolean) =
    (generate(systemPrompt, userPrompt), false)
}

/** Production annotator: HTTP chat-completion client with the reference's
  * call contract (`ai/llm.py:12-14,55-76`) — an Ollama-style
  * `POST /api/chat` with `stream=false` and options `temperature=0,
  * num_predict=16384, num_ctx=4096`, bounded by `timeout` — plus what the
  * reference lacks: up to `maxRetries` retries on transport errors /
  * non-200s, and a failure flag (instead of a silent `""`) so the pipeline
  * can record `failed_batches` lineage.
  *
  * Serializable by construction: only config strings/ints ship to
  * executors; the JDK HttpClient is rebuilt lazily per executor JVM
  * (the `st.cache_resource` analog, SURVEY §4 "resource caching").
  */
final case class HttpAnnotator(
    endpoint: String, // e.g. http://localhost:11434/api/chat
    model: String,
    timeout: java.time.Duration = java.time.Duration.ofSeconds(600),
    maxRetries: Int = 2) extends Annotator {

  @transient private lazy val client =
    java.net.http.HttpClient.newBuilder().connectTimeout(timeout).build()
  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  private def requestBody(systemPrompt: String, userPrompt: String): String = {
    val root = mapper.createObjectNode()
    root.put("model", model)
    root.put("stream", false)
    val msgs = root.putArray("messages")
    val sys = msgs.addObject(); sys.put("role", "system"); sys.put("content", systemPrompt)
    val usr = msgs.addObject(); usr.put("role", "user"); usr.put("content", userPrompt)
    val opts = root.putObject("options")
    opts.put("temperature", 0) // determinism prerequisite (llm.py:59)
    opts.put("num_predict", 16384)
    opts.put("num_ctx", 4096)
    mapper.writeValueAsString(root)
  }

  override def generateChecked(systemPrompt: String, userPrompt: String): (String, Boolean) = {
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(endpoint))
      .timeout(timeout)
      .header("Content-Type", "application/json")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
        requestBody(systemPrompt, userPrompt)))
      .build()
    var attempt = 0
    while (attempt <= maxRetries) {
      try {
        val resp = client.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() == 200) {
          val content = mapper.readTree(resp.body()).path("message").path("content")
          if (!content.isMissingNode) return (content.asText(""), false)
        }
      } catch {
        case _: InterruptedException =>
          // a Spark task kill interrupts the task thread mid-send: restore
          // the flag (swallowing it would absorb the kill) and fail the
          // batch NOW — retrying would pin a cancelled task for up to
          // (maxRetries+1) × timeout
          Thread.currentThread().interrupt()
          return ("", true)
        case _: java.io.IOException => // transport error — retry
      }
      attempt += 1
    }
    ("", true)
  }

  /** Reference-faithful face: failures collapse to `""` (`llm.py:75-76`). */
  override def generate(systemPrompt: String, userPrompt: String): String =
    generateChecked(systemPrompt, userPrompt)._1
}

/** Together-AI-shaped annotator — the reference's second production client
  * (ref `ai/llm.py:104-144`: `ChatTogether(model=TOGETHER_MODEL,
  * temperature=0)` over Together's hosted endpoint). Speaks the OpenAI
  * chat-completions contract: `POST <endpoint>` with `Authorization:
  * Bearer <key>` and `{model, temperature, max_tokens, messages:[system,
  * user]}`; the completion arrives at `choices[0].message.content`.
  *
  * Hosted endpoints are RATE-LIMITED (the reference's default model is
  * the free tier), so unlike [[HttpAnnotator]] this client throttles:
  * all task threads of an executor JVM share one request-slot reservation
  * (CAS on the companion's clock — `minIntervalMillis` between departures)
  * and a `429` response honors `Retry-After` before retrying. Both waits
  * are interrupt-safe: a Spark task kill mid-sleep fails the batch
  * immediately instead of pinning the cancelled task.
  *
  * The budget is CLUSTER-GLOBAL: `minIntervalMillis` states the
  * provider's aggregate limit, and `workers` states how many executor
  * JVMs annotate concurrently (the pipeline's annotator-partition /
  * executor count — [[graft.kg.KgPipeline]] plans that number). Each JVM
  * spaces its own departures by `workers × minIntervalMillis`, so N
  * executors together sustain at most the configured aggregate rate —
  * a per-JVM-only throttle would multiply the budget by the cluster
  * size. (The JVM clocks are unsynchronized in phase, so a transient
  * burst of up to `workers` near-simultaneous requests is possible; the
  * SUSTAINED rate is what providers meter and what the spacing bounds.)
  *
  * Serializable by construction: only config strings/numbers ship to
  * executors; the HTTP client and throttle clock are per-executor-JVM
  * (`clockKey` selects the clock — production leaves the default, tests
  * simulate distinct worker JVMs inside one test JVM). */
final case class TogetherAnnotator(
    endpoint: String, // e.g. https://api.together.xyz/v1/chat/completions
    apiKey: String,
    model: String = "meta-llama/Llama-3.3-70B-Instruct-Turbo-Free", // llm.py:11
    timeout: java.time.Duration = java.time.Duration.ofSeconds(600),
    maxRetries: Int = 3,
    minIntervalMillis: Long = 1000L,
    workers: Int = 1,
    clockKey: String = "global") extends Annotator {

  require(workers >= 1, s"workers must be >= 1, got $workers")

  /** Case-class toString would embed the bearer token — Spark task logs
    * and exception messages print closure fields, so redact it. */
  override def toString: String =
    s"TogetherAnnotator($endpoint,apiKey=***,$model,$timeout,$maxRetries," +
      s"$minIntervalMillis,$workers,$clockKey)"

  @transient private lazy val client =
    java.net.http.HttpClient.newBuilder().connectTimeout(timeout).build()
  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  private def requestBody(systemPrompt: String, userPrompt: String): String = {
    val root = mapper.createObjectNode()
    root.put("model", model)
    root.put("temperature", 0) // determinism prerequisite (llm.py:116)
    root.put("max_tokens", 16384)
    val msgs = root.putArray("messages")
    val sys = msgs.addObject(); sys.put("role", "system"); sys.put("content", systemPrompt)
    val usr = msgs.addObject(); usr.put("role", "user"); usr.put("content", userPrompt)
    mapper.writeValueAsString(root)
  }

  /** Sleep until `untilNanos`; false if interrupted (task kill). */
  private def sleepUntil(untilNanos: Long): Boolean = {
    val waitMs = (untilNanos - System.nanoTime()) / 1000000L
    if (waitMs <= 0) return true
    try { Thread.sleep(waitMs); true }
    catch {
      case _: InterruptedException =>
        Thread.currentThread().interrupt(); false
    }
  }

  override def generateChecked(systemPrompt: String, userPrompt: String): (String, Boolean) = {
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(endpoint))
      .timeout(timeout)
      .header("Content-Type", "application/json")
      .header("Authorization", s"Bearer $apiKey")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
        requestBody(systemPrompt, userPrompt)))
      .build()
    var attempt = 0
    while (attempt <= maxRetries) {
      // this JVM's share of the cluster-global budget: workers × interval
      if (!sleepUntil(TogetherAnnotator.reserveSlot(
          minIntervalMillis * workers, clockKey)))
        return ("", true) // interrupted while throttled — fail the batch now
      try {
        val resp = client.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() == 200) {
          val content = mapper.readTree(resp.body())
            .path("choices").path(0).path("message").path("content")
          if (!content.isMissingNode) return (content.asText(""), false)
        } else if (resp.statusCode() == 429) {
          // push the shared clock past the server's cool-down so sibling
          // task threads don't immediately re-trip the limit
          val retryAfter = resp.headers().firstValue("Retry-After")
          val coolDownMs =
            if (retryAfter.isPresent)
              retryAfter.get().toLongOption.map(_ * 1000L).getOrElse(minIntervalMillis)
            else minIntervalMillis
          TogetherAnnotator.pushBack(coolDownMs, clockKey)
        }
      } catch {
        case _: InterruptedException =>
          Thread.currentThread().interrupt()
          return ("", true)
        case _: java.io.IOException => // transport error — retry
      }
      attempt += 1
    }
    ("", true)
  }

  /** Reference-faithful face: failures collapse to `""` (`llm.py:75-76`). */
  override def generate(systemPrompt: String, userPrompt: String): String =
    generateChecked(systemPrompt, userPrompt)._1
}

object TogetherAnnotator {
  /** Next free departure time (nanos) per clock key — ONE clock per
    * executor JVM in production (the default "global" key), shared by
    * every task thread, so the JVM's request rate stays under its share
    * of the provider limit regardless of task parallelism. Distinct keys
    * exist so tests can simulate separate worker JVMs in one process. */
  private val clocks = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.AtomicLong]()

  private def clock(key: String): java.util.concurrent.atomic.AtomicLong =
    clocks.computeIfAbsent(key,
      _ => new java.util.concurrent.atomic.AtomicLong(0L))

  /** Reserve the next departure slot ≥ now, spaced `intervalMillis` after
    * the previous reservation; returns the nanos to sleep until. */
  private[graft] def reserveSlot(intervalMillis: Long,
      key: String = "global"): Long = {
    val c = clock(key)
    while (true) {
      val now = System.nanoTime()
      val prev = c.get()
      val slot = math.max(now, prev)
      if (c.compareAndSet(prev, slot + intervalMillis * 1000000L))
        return slot
    }
    0L // unreachable
  }

  /** Delay all future slots by at least `coolDownMs` from now (429). */
  private[graft] def pushBack(coolDownMs: Long,
      key: String = "global"): Unit = {
    val c = clock(key)
    val until = System.nanoTime() + coolDownMs * 1000000L
    var prev = c.get()
    while (prev < until && !c.compareAndSet(prev, until))
      prev = c.get()
  }
}

/** Deterministic mock: emits `<category>:<surface>` for every dictionary
  * entry whose surface occurs verbatim in the user prompt (the batch text),
  * in dictionary order; "None" when nothing matches (the reference prompt's
  * rule 6). Pure function of (dictionary, userPrompt). */
final case class DictAnnotator(dictionary: Seq[(String, String)]) extends Annotator {
  override def generate(systemPrompt: String, userPrompt: String): String = {
    val lines = dictionary.collect {
      case (cat, surf) if userPrompt.contains(surf) => s"<$cat>:$surf"
    }
    if (lines.isEmpty) "None" else lines.mkString("\n")
  }
}

/** Wraps another annotator's output in a `<think>…</think>` reasoning block —
  * produces what a reasoning model (reference `ai/llm.py:79-101`) would emit,
  * to exercise the LRM strip stage. */
final case class ThinkingAnnotator(inner: Annotator, reasoning: String = "step by step")
    extends Annotator {
  override def generate(systemPrompt: String, userPrompt: String): String =
    s"<think>\n$reasoning\n</think>\n" + inner.generate(systemPrompt, userPrompt)
}

object LrmStrip {
  /** Remove `<think>…</think>` (DOTALL, non-greedy) then Python-strip —
    * reference `ai/llm.py:100-101`. */
  def apply(response: String): String =
    graft.text.PyStr.strip("(?s)<think>.*?</think>".r.replaceAllIn(response, ""))
}
