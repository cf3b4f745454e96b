package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.io.InputStream
import java.nio.charset.StandardCharsets.US_ASCII

/** WARC (ISO 28500) source — the canonical container for web-crawl corpora
  * (Common Crawl ships ~100 TB/crawl as `.warc.gz`). Parses `WARC/1.0`
  * records: header block (CRLF-terminated `Name: value` lines), empty line,
  * `Content-Length` payload bytes, CRLF CRLF separator. `response` records
  * carry an HTTP message in the payload; [[responses]] strips the HTTP head
  * and yields `(url, html)` rows ready for the KG pipeline.
  *
  * Scale shape: one task per WARC file — the standard Common Crawl layout
  * is tens of thousands of ~1 GB files, so per-file parallelism saturates
  * any cluster without a record-splitting reader. Within a task the file is
  * STREAMED record-by-record ([[parseRecordsStream]]): memory is O(one
  * record), never O(file) — a real crawl file inflates to 3–5 GB, past the
  * JVM's 2 GB array bound, so a whole-file inflate (this source's original
  * design) throws on file one of a production segment. Gzipped archives
  * (`.warc.gz`, the format crawls actually ship: one gzip member per
  * record, concatenated) are detected by magic bytes and inflated through
  * a concatenated-member-aware stream that the record parser consumes
  * member-by-member as it advances. Parsing is a narrow flatMap — no
  * shuffle until the pipeline's own wide stages.
  *
  * Reference context: the reference reads pre-extracted text corpora
  * (ref: datasets_info/utils/brat.py); a web-scale deployment of the same
  * pipeline starts one step earlier, at the crawl archive — this source
  * closes that gap.
  */
object Warc {

  final case class WarcRecord(
      warc_type: String,
      target_uri: String,
      warc_date: String,
      content_type: String,
      payload: Array[Byte])

  private def bytesIndexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = from
    val last = hay.length - needle.length
    while (i <= last) {
      var k = 0
      while (k < needle.length && hay(i + k) == needle(k)) k += 1
      if (k == needle.length) return i
      i += 1
    }
    -1
  }

  private val CrLfCrLf = "\r\n\r\n".getBytes(US_ASCII)

  /** Parse all records of one WARC byte array (fixtures, small files, and
    * the differential oracle for [[parseRecordsStream]] — the file-reading
    * paths stream instead and never materialize an archive). */
  def parseRecords(bytes: Array[Byte]): Iterator[WarcRecord] = new Iterator[WarcRecord] {
    private var pos = 0
    private var nextRec: WarcRecord = advance()

    @annotation.tailrec
    private def advance(): WarcRecord = {
      // tolerate inter-record padding/garbage: seek the next version line
      val start = Warc.bytesIndexOf(bytes, "WARC/".getBytes(US_ASCII), pos)
      if (start < 0) return null
      val headEnd = Warc.bytesIndexOf(bytes, CrLfCrLf, start)
      if (headEnd < 0) return null
      val head = new String(bytes, start, headEnd - start, US_ASCII)
      val headers = parseHeaders(head.split("\r\n").drop(1))
      val bodyStart = headEnd + 4
      // malformed Content-Length (non-numeric, negative, > array bound):
      // skip past the header block and reseek — same recovery as the
      // streaming parser, so the two stay differentially interchangeable
      headers.get("content-length").flatMap(_.toLongOption) match {
        case Some(len) if len >= 0 && len <= Int.MaxValue - 8 =>
          // Long arithmetic: bodyStart + a near-max declared length wraps
          // Int and would crash the copy instead of clamping to the array
          val bodyEnd = math.min(bodyStart.toLong + len, bytes.length.toLong).toInt
          pos = bodyEnd
          record(headers, java.util.Arrays.copyOfRange(bytes, bodyStart, bodyEnd))
        case _ =>
          pos = bodyStart
          advance()
      }
    }

    override def hasNext: Boolean = nextRec != null
    override def next(): WarcRecord = {
      val r = nextRec; nextRec = advance(); r
    }
  }

  private def parseHeaders(lines: Array[String]): Map[String, String] =
    lines.flatMap { line =>
      line.indexOf(':') match {
        case -1 => None
        case i  => Some(line.take(i).trim.toLowerCase -> line.drop(i + 1).trim)
      }
    }.toMap

  private def record(headers: Map[String, String], body: Array[Byte]): WarcRecord =
    WarcRecord(
      headers.getOrElse("warc-type", ""),
      // the spec wraps the URI in <> in some writers — strip both forms
      headers.getOrElse("warc-target-uri", "").stripPrefix("<").stripSuffix(">"),
      headers.getOrElse("warc-date", ""),
      headers.getOrElse("content-type", ""),
      body)

  /** One CRLF-terminated ASCII line from the stream, `null` at EOF with no
    * bytes pending. Bounded: a line longer than `maxLine` (binary garbage
    * with no newline) keeps only its LAST ≤`maxLine` bytes — the retained
    * TAIL is what matters, because a version marker abutting the garbage
    * sits at the line's end and the parser's `contains("WARC/")` seek must
    * still find it (keeping the head would silently drop such a record;
    * the marker straddling a discard boundary remains a theoretical miss,
    * at odds ~5/2²⁰ per overflowing chunk). */
  private def readLine(in: InputStream, maxLine: Int = 1 << 20): String = {
    val buf = new java.io.ByteArrayOutputStream(64)
    var b = in.read()
    if (b < 0) return null
    while (b >= 0 && b != '\n') {
      if (buf.size >= maxLine) buf.reset() // keep the tail, not the head
      buf.write(b)
      b = in.read()
    }
    val s = new String(buf.toByteArray, US_ASCII)
    if (s.endsWith("\r")) s.dropRight(1) else s
  }

  /** Streaming record parse: memory O(one record), not O(archive). Skips
    * non-record lines until a `WARC/` version line (the same padding
    * tolerance as [[parseRecords]] for line-structured padding), reads the
    * header block to the empty line, then exactly `Content-Length` payload
    * bytes. The stream is consumed lazily as the iterator advances — a
    * gzip-member-aware stream on top makes this the `.warc.gz` path with
    * peak memory = one record + the codec's fixed buffers. */
  def parseRecordsStream(in: InputStream): Iterator[WarcRecord] = new Iterator[WarcRecord] {
    private var nextRec: WarcRecord = advance()

    @annotation.tailrec
    private def advance(): WarcRecord = {
      // tolerate garbage ABUTTING the version marker mid-line (the byte
      // parser seeks the "WARC/" pattern anywhere; match that)
      var line = readLine(in)
      while (line != null && !line.contains("WARC/")) line = readLine(in)
      if (line == null) return null
      val headerLines = scala.collection.mutable.ArrayBuffer.empty[String]
      var h = readLine(in)
      while (h != null && h.nonEmpty) { headerLines += h; h = readLine(in) }
      if (h == null) return null // truncated header block at EOF
      val headers = parseHeaders(headerLines.toArray)
      headers.get("content-length").flatMap(_.toLongOption) match {
        case Some(len) if len >= 0 && len <= Int.MaxValue - 8 =>
          val body = in.readNBytes(len.toInt)
          record(headers, body)
        case _ => advance() // unframeable record — reseek the next version line
      }
    }

    override def hasNext: Boolean = nextRec != null
    override def next(): WarcRecord = {
      val r = nextRec; nextRec = advance(); r
    }
  }

  private val GzipMagic = Array(0x1f.toByte, 0x8b.toByte)

  /** Is this byte array a gzip stream (`.warc.gz`)? */
  def isGzip(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && bytes(0) == GzipMagic(0) && bytes(1) == GzipMagic(1)

  /** Wrap a raw archive stream for record parsing: sniff the gzip magic
    * (2-byte pushback — object stores routinely mislabel, so the FILE NAME
    * is never trusted) and, when present, inflate through a concatenated-
    * member-aware gzip stream (Common Crawl `.warc.gz` is one gzip member
    * PER RECORD, the ISO 28500 annex's seekability recommendation —
    * members are walked one at a time as the parser consumes them). */
  def recordStream(raw: InputStream): InputStream = {
    val pb = new java.io.PushbackInputStream(
      new java.io.BufferedInputStream(raw, 1 << 16), 2)
    // readNBytes loops to the full 2 bytes — a single read() may legally
    // return 1 byte (network FS) and would misdetect gzip as plain
    val head = pb.readNBytes(2)
    if (head.length > 0) pb.unread(head)
    if (head.length == 2 && head(0) == GzipMagic(0) && head(1) == GzipMagic(1))
      org.apache.commons.compress.compressors.gzip.GzipCompressorInputStream
        .builder().setInputStream(pb).setDecompressConcatenated(true).get()
    else pb
  }

  /** [[parseRecords]] semantics over an in-memory archive with transparent
    * gzip detection — streams the inflate (O(record) peak) rather than
    * materializing the inflated archive (which exceeds the 2 GB array
    * bound on real crawl files). */
  def parseRecordsAuto(bytes: Array[Byte]): Iterator[WarcRecord] =
    if (isGzip(bytes))
      parseRecordsStream(recordStream(new java.io.ByteArrayInputStream(bytes)))
    else parseRecords(bytes)

  /** Deflate one gzip member. */
  private def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    bos.toByteArray
  }

  /** Split an HTTP message payload into (status line, body bytes). */
  def httpBody(payload: Array[Byte]): Array[Byte] = {
    val sep = bytesIndexOf(payload, CrLfCrLf, 0)
    if (sep < 0) payload
    else java.util.Arrays.copyOfRange(payload, sep + 4, payload.length)
  }

  /** The session's Hadoop settings as a plain serializable map — the
    * executor-side rebuild overlays them on classpath defaults so
    * object-store credentials/endpoints configured via `spark.hadoop.*`
    * (the standard way) reach the per-task `fs.open`, exactly as they
    * would through a binaryFile content read. */
  private def hadoopConfMap(spark: SparkSession): Map[String, String] = {
    val c = spark.sessionState.newHadoopConf()
    val it = c.iterator()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
    b.result()
  }

  /** Open one archive for streaming on an executor, under the session's
    * Hadoop configuration (rebuilt from `confMap`). */
  private def openArchive(path: String, confMap: Map[String, String]): InputStream = {
    val conf = new org.apache.hadoop.conf.Configuration()
    confMap.foreach { case (k, v) => conf.set(k, v) }
    val p = new org.apache.hadoop.fs.Path(path)
    recordStream(p.getFileSystem(conf).open(p))
  }

  /** Parse a whole archive as a stream, closing it at exhaustion and — when
    * running inside a Spark task — at task completion (covers early
    * termination: limits, take(), task kills). */
  private def streamArchive(path: String, confMap: Map[String, String]): Iterator[WarcRecord] = {
    val in = openArchive(path, confMap)
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => in.close()))
    val it = parseRecordsStream(in)
    new Iterator[WarcRecord] {
      override def hasNext: Boolean = {
        val h = it.hasNext
        if (!h) in.close()
        h
      }
      override def next(): WarcRecord = it.next()
    }
  }

  private def archivePaths(spark: SparkSession, path: String): DataFrame =
    // binaryFile with only `path` selected prunes the content read — this
    // is purely a listing (driver-side planning), no file bytes move
    spark.read.format("binaryFile").load(path).select(col("path"))

  /** All WARC records under a path/glob: one narrow STREAMING parse task
    * per file — peak task memory is one record, for plain and `.warc.gz`
    * archives alike (magic-byte detection per file). */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val confMap = hadoopConfMap(spark)
    archivePaths(spark, path).as[String]
      .flatMap { file =>
        streamArchive(file, confMap).map(r =>
          (file, r.warc_type, r.target_uri, r.warc_date, r.content_type, r.payload))
      }
      .toDF("file", "warc_type", "target_uri", "warc_date", "content_type", "payload")
  }

  /** `(url, html)` rows from the `response` records — the KG pipeline's
    * input contract (html as BINARY, exactly as crawled). Reads plain and
    * gzipped archives alike, streaming each file record-by-record. */
  def responses(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val confMap = hadoopConfMap(spark)
    archivePaths(spark, path).as[String]
      .flatMap { file =>
        streamArchive(file, confMap)
          .filter(r => r.warc_type == "response" && r.target_uri.nonEmpty)
          .map(r => (r.target_uri, httpBody(r.payload)))
      }
      .toDF("url", "html")
  }

  /** One serialized WARC record (headers + body + CRLF CRLF terminator). */
  private def recordBytes(typ: String, uri: Option[String], contentType: String,
      body: Array[Byte], date: String): Array[Byte] = {
    val h = new StringBuilder()
    h ++= "WARC/1.0\r\n"
    h ++= s"WARC-Type: $typ\r\n"
    h ++= s"WARC-Date: $date\r\n"
    uri.foreach(u => h ++= s"WARC-Target-URI: $u\r\n")
    h ++= s"Content-Type: $contentType\r\n"
    h ++= s"Content-Length: ${body.length}\r\n\r\n"
    val out = new java.io.ByteArrayOutputStream()
    out.write(h.toString.getBytes(US_ASCII))
    out.write(body)
    out.write("\r\n\r\n".getBytes(US_ASCII))
    out.toByteArray
  }

  private def allRecords(pages: Seq[(String, Array[Byte])], date: String): Seq[Array[Byte]] =
    recordBytes("warcinfo", None, "application/warc-fields",
      "software: graft-warc-fixture\r\n".getBytes(US_ASCII), date) +:
      pages.map { case (url, html) =>
        val http = s"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\nContent-Length: ${html.length}\r\n\r\n"
        recordBytes("response", Some(url), "application/http;msgtype=response",
          http.getBytes(US_ASCII) ++ html, date)
      }

  /** Single-pass concatenation — `reduce(_ ++ _)` would copy a growing
    * prefix per record (O(records × bytes) memcpy on a realistic segment). */
  private def concatAll(chunks: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(
      chunks.iterator.map(_.length).sum max 64)
    chunks.foreach(out.write)
    out.toByteArray
  }

  /** Serialize `(url, html)` pages as one WARC file's bytes (warcinfo
    * record + one `response` record per page) — the test/fixture writer;
    * also the shape a re-crawl sink would emit. */
  def writeWarc(pages: Seq[(String, Array[Byte])], date: String = "2026-01-01T00:00:00Z"): Array[Byte] =
    concatAll(allRecords(pages, date))

  /** Serialize pages in Common Crawl's shipping format: `.warc.gz` with one
    * gzip member PER RECORD, concatenated — exactly what [[recordStream]]
    * walks and what a real crawl segment looks like on disk. */
  def writeWarcGz(pages: Seq[(String, Array[Byte])], date: String = "2026-01-01T00:00:00Z"): Array[Byte] =
    concatAll(allRecords(pages, date).map(gzipMember))
}
