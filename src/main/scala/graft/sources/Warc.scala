package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets.US_ASCII

/** WARC (ISO 28500) source — the canonical container for web-crawl corpora
  * (Common Crawl ships ~100 TB/crawl as `.warc.gz`). Parses `WARC/1.0`
  * records: header block (CRLF-terminated `Name: value` lines), empty line,
  * `Content-Length` payload bytes, CRLF CRLF separator. `response` records
  * carry an HTTP message in the payload; [[responses]] strips the HTTP head
  * and yields `(url, html)` rows ready for the KG pipeline.
  *
  * Scale shape: one task per WARC file (`binaryFile` source) — the standard
  * Common Crawl layout is tens of thousands of ~1 GB files, so per-file
  * parallelism saturates any cluster without a record-splitting reader.
  * Gzipped archives (`.warc.gz`, the format crawls actually ship: one gzip
  * member per record, concatenated) are detected by magic bytes and
  * inflated in-task via a concatenated-member-aware stream — see
  * [[gunzipAll]]; an intra-file member-boundary splitter remains the
  * upgrade path if single files ever dominate. Parsing is a narrow
  * flatMap — no shuffle until the pipeline's own wide stages.
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

  /** Parse all records of one WARC file held in memory (one task = one
    * file; Common Crawl files are ~1 GB, well within executor memory). */
  def parseRecords(bytes: Array[Byte]): Iterator[WarcRecord] = new Iterator[WarcRecord] {
    private var pos = 0
    private var nextRec: WarcRecord = advance()

    private def advance(): WarcRecord = {
      // tolerate inter-record padding/garbage: seek the next version line
      val start = Warc.bytesIndexOf(bytes, "WARC/".getBytes(US_ASCII), pos)
      if (start < 0) return null
      val headEnd = Warc.bytesIndexOf(bytes, CrLfCrLf, start)
      if (headEnd < 0) return null
      val head = new String(bytes, start, headEnd - start, US_ASCII)
      val headers = head.split("\r\n").drop(1).flatMap { line =>
        line.indexOf(':') match {
          case -1 => None
          case i  => Some(line.take(i).trim.toLowerCase -> line.drop(i + 1).trim)
        }
      }.toMap
      val len = headers.getOrElse("content-length", "0").toInt
      val bodyStart = headEnd + 4
      val bodyEnd = math.min(bodyStart + len, bytes.length)
      pos = bodyEnd
      WarcRecord(
        headers.getOrElse("warc-type", ""),
        // the spec wraps the URI in <> in some writers — strip both forms
        headers.getOrElse("warc-target-uri", "").stripPrefix("<").stripSuffix(">"),
        headers.getOrElse("warc-date", ""),
        headers.getOrElse("content-type", ""),
        java.util.Arrays.copyOfRange(bytes, bodyStart, bodyEnd))
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

  /** Inflate ALL members of a (possibly multi-member) gzip stream into one
    * byte array. Common Crawl `.warc.gz` files are one gzip member PER
    * RECORD (the ISO 28500 annex's recommendation, which is what makes the
    * format seekable), concatenated back-to-back;
    * `GzipCompressorInputStream(decompressConcatenated = true)` walks every
    * member. The inflated stream then goes through the same [[parseRecords]]
    * as an uncompressed archive. */
  def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    val in = new org.apache.commons.compress.compressors.gzip.GzipCompressorInputStream(
      new java.io.ByteArrayInputStream(bytes), true)
    try org.apache.commons.io.IOUtils.toByteArray(in)
    finally in.close()
  }

  /** [[parseRecords]] with transparent per-file gzip detection (magic
    * bytes, not file name — object stores routinely mislabel). */
  def parseRecordsAuto(bytes: Array[Byte]): Iterator[WarcRecord] =
    parseRecords(if (isGzip(bytes)) gunzipAll(bytes) else bytes)

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

  /** All WARC records under a path/glob: one narrow parse task per file.
    * Gzipped archives (`.warc.gz`, detected by magic bytes) are inflated
    * in-task before parsing. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (file, bytes) =>
        parseRecordsAuto(bytes).map(r =>
          (file, r.warc_type, r.target_uri, r.warc_date, r.content_type, r.payload))
      }
      .toDF("file", "warc_type", "target_uri", "warc_date", "content_type", "payload")
  }

  /** `(url, html)` rows from the `response` records — the KG pipeline's
    * input contract (html as BINARY, exactly as crawled). Reads plain and
    * gzipped archives alike. */
  def responses(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("content"))
      .as[Array[Byte]]
      .flatMap { bytes =>
        parseRecordsAuto(bytes)
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
    * gzip member PER RECORD, concatenated — exactly what [[gunzipAll]]
    * inverts and what a real crawl segment looks like on disk. */
  def writeWarcGz(pages: Seq[(String, Array[Byte])], date: String = "2026-01-01T00:00:00Z"): Array[Byte] =
    concatAll(allRecords(pages, date).map(gzipMember))
}
