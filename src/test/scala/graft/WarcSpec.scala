package graft

import graft.fixtures.WebTextGen
import graft.kg.KgPipeline
import graft.sources.Warc
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** WARC source: byte-exact record round-trip, parser robustness, and
  * end-to-end parity — the KG pipeline over a WARC-read corpus must emit
  * exactly the triples of the direct-table path. */
class WarcSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-warc-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def writeCorpus(n: Int, filesN: Int): (String, Seq[graft.core.WebPage]) = {
    val pages = (0L until n.toLong).map(WebTextGen.page(_))
    val dir = Files.createTempDirectory("graft-warc-")
    pages.grouped(math.max(1, n / filesN)).zipWithIndex.foreach { case (g, i) =>
      Files.write(dir.resolve(f"part-$i%05d.warc"),
        Warc.writeWarc(g.map(p => p.url -> p.html)))
    }
    (dir.toString, pages)
  }

  test("WARC round-trip preserves html bytes per url across files") {
    val (dir, pages) = writeCorpus(40, 3)
    val got = Warc.responses(spark, s"$dir/*.warc").collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(got.size == 40)
    pages.foreach { p =>
      assert(got(p.url).sameElements(p.html), s"byte mismatch for ${p.url}")
    }
  }

  test("gzipped WARC round-trip: multi-member .warc.gz, mixed with plain files") {
    val pages = (0L until 60L).map(WebTextGen.page(_))
    val dir = Files.createTempDirectory("graft-warc-gz-")
    // half the archives gzipped (one member per record, the Common Crawl
    // layout), half plain — the source must detect per file by magic bytes
    pages.grouped(20).zipWithIndex.foreach { case (g, i) =>
      val kv = g.map(p => p.url -> p.html)
      if (i % 2 == 0)
        Files.write(dir.resolve(f"part-$i%05d.warc.gz"), Warc.writeWarcGz(kv))
      else
        Files.write(dir.resolve(f"part-$i%05d.warc"), Warc.writeWarc(kv))
    }
    val gzBytes = Files.readAllBytes(dir.resolve("part-00000.warc.gz"))
    assert(Warc.isGzip(gzBytes))
    // one gzip member per record: 20 responses + 1 warcinfo = 21 members ⇒
    // 21 magic headers in the file (deflate bodies can't contain the pair
    // at a member boundary by construction of this assertion: count ≥ 21)
    val magics = gzBytes.sliding(2).count(w =>
      w(0) == 0x1f.toByte && w(1) == 0x8b.toByte)
    assert(magics >= 21, s"expected >=21 gzip members, saw $magics")
    val got = Warc.responses(spark, s"$dir/*.warc*").collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(got.size == 60)
    pages.foreach(p => assert(got(p.url).sameElements(p.html), s"byte mismatch ${p.url}"))
  }

  test("gz auto-detect walks concatenated members and tolerates in-stream padding") {
    val html = "<html><body>gz</body></html>".getBytes("UTF-8")
    // member 1: warcinfo+response; member 2 (separate gzip member): a
    // record preceded by inter-record garbage INSIDE the deflated stream —
    // parseRecords must still frame by the version line + Content-Length
    val m1 = Warc.writeWarcGz(Seq("https://gz.example/1" -> html))
    val padded = "garbage-padding\r\n".getBytes("UTF-8") ++
      Warc.writeWarc(Seq("https://gz.example/2" -> html)).drop(
        Warc.writeWarc(Seq.empty).length) // strip the warcinfo of the 2nd file
    val m2 = {
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(padded); gz.close(); bos.toByteArray
    }
    val recs = Warc.parseRecordsAuto(m1 ++ m2).toSeq
    assert(recs.map(_.warc_type) == Seq("warcinfo", "response", "response"))
    assert(recs.map(_.target_uri).drop(1) ==
      Seq("https://gz.example/1", "https://gz.example/2"))
    recs.drop(1).foreach(r => assert(Warc.httpBody(r.payload).sameElements(html)))
  }

  test("both parsers skip malformed Content-Length records identically and recover") {
    val html = "<html><body>ok</body></html>".getBytes("UTF-8")
    def badRecord(lenValue: String): Array[Byte] =
      ("WARC/1.0\r\nWARC-Type: response\r\n" +
        "WARC-Target-URI: https://bad.example/x\r\n" +
        s"Content-Length: $lenValue\r\n\r\n").getBytes("UTF-8")
    val good = Warc.writeWarc(Seq("https://good.example/1" -> html))
    // non-numeric, negative, and over-bound lengths before a valid archive
    val bytes = badRecord("abc") ++ badRecord("-5") ++
      badRecord("99999999999999") ++ good
    val fromBytes = Warc.parseRecords(bytes).toSeq
    val fromStream = Warc.parseRecordsStream(
      new java.io.ByteArrayInputStream(bytes)).toSeq
    assert(fromBytes.map(_.target_uri) == fromStream.map(_.target_uri))
    assert(fromBytes.map(_.warc_type) == Seq("warcinfo", "response"))
    assert(Warc.httpBody(fromBytes.last.payload).sameElements(html))

    // a near-Int.MaxValue declared length passes the guard but must CLAMP
    // (Long arithmetic), not wrap negative and crash the copy
    val bytes2 = good ++ badRecord("2147483630")
    val b2 = Warc.parseRecords(bytes2).toSeq
    val s2 = Warc.parseRecordsStream(new java.io.ByteArrayInputStream(bytes2)).toSeq
    assert(b2.map(_.target_uri) == s2.map(_.target_uri))
    assert(b2.size == 3) // warcinfo + good response + clamped empty-body record
  }

  test("streaming parser finds a version marker after >1MB of newline-free garbage (tail-keep)") {
    val html = "<html><body>big</body></html>".getBytes("UTF-8")
    val rec = Warc.writeWarc(Seq("https://tail.example/1" -> html))
    val junk = Array.fill[Byte]((1 << 20) + 4096)('x'.toByte)
    val bytes = junk ++ rec
    val got = Warc.parseRecordsStream(new java.io.ByteArrayInputStream(bytes)).toSeq
    assert(got.map(_.warc_type) == Seq("warcinfo", "response"))
    assert(Warc.httpBody(got.last.payload).sameElements(html))
  }

  test("streaming parser recovers when garbage abuts the version line mid-line") {
    val html = "<html><body>abut</body></html>".getBytes("UTF-8")
    val rec = Warc.writeWarc(Seq("https://abut.example/1" -> html))
    // no newline between the junk and "WARC/1.0" — the byte parser seeks
    // the pattern anywhere; the stream parser must match that tolerance
    val bytes = "mid-line-junk-no-newline".getBytes("UTF-8") ++ rec
    val fromStream = Warc.parseRecordsStream(
      new java.io.ByteArrayInputStream(bytes)).toSeq
    val fromBytes = Warc.parseRecords(bytes).toSeq
    assert(fromStream.map(_.target_uri) == fromBytes.map(_.target_uri))
    assert(fromStream.map(_.warc_type) == Seq("warcinfo", "response"))
    assert(Warc.httpBody(fromStream.last.payload).sameElements(html))
  }

  test("streaming .warc.gz parse is incremental (O(record) memory) and matches the byte parser") {
    // incompressible payloads so compressed size tracks inflated size and
    // the consumption assertion below is robust to codec buffering
    val rnd = new scala.util.Random(42)
    val pages = (1 to 8).map { i =>
      val body = new Array[Byte](512 * 1024)
      rnd.nextBytes(body)
      s"https://stream.example/$i" -> body
    }
    val gz = Warc.writeWarcGz(pages)
    var consumed = 0L
    val counting = new java.io.FilterInputStream(
        new java.io.ByteArrayInputStream(gz)) {
      override def read(): Int = {
        val b = super.read(); if (b >= 0) consumed += 1; b
      }
      override def read(buf: Array[Byte], off: Int, len: Int): Int = {
        val n = super.read(buf, off, len); if (n > 0) consumed += n; n
      }
    }
    val it = Warc.parseRecordsStream(Warc.recordStream(counting))
    val first2 = Seq(it.next(), it.next()) // warcinfo + response 1
    assert(first2.map(_.warc_type) == Seq("warcinfo", "response"))
    // after two records only ~one 512 KB member (+codec buffers) may have
    // been consumed — a whole-file inflate would have read all ~4 MB here
    assert(consumed < gz.length * 0.3,
      s"stream read $consumed of ${gz.length} bytes for the first 2 records")
    val rest = it.toSeq
    // full differential parity against the in-memory byte parser
    val expected = Warc.parseRecords(Warc.writeWarc(pages)).toSeq
    val got = first2 ++ rest
    assert(got.size == expected.size)
    got.zip(expected).foreach { case (a, b) =>
      assert(a.warc_type == b.warc_type && a.target_uri == b.target_uri &&
        a.warc_date == b.warc_date && a.content_type == b.content_type &&
        a.payload.sameElements(b.payload))
    }
  }

  test("parser skips warcinfo, unwraps <URI>, and survives padding") {
    val html = "<html><body>x</body></html>".getBytes("UTF-8")
    val base = Warc.writeWarc(Seq("https://a.example/1" -> html))
    // hand-mangle: <>-wrapped URI + leading garbage before the first record
    val wrapped = new String(base, java.nio.charset.StandardCharsets.ISO_8859_1)
      .replace("WARC-Target-URI: https://a.example/1",
        "WARC-Target-URI: <https://a.example/1>")
    val bytes = ("junk-preamble\r\n" + wrapped).getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val recs = Warc.parseRecords(bytes).toSeq
    assert(recs.map(_.warc_type) == Seq("warcinfo", "response"))
    assert(recs(1).target_uri == "https://a.example/1")
    assert(Warc.httpBody(recs(1).payload).sameElements(html))
  }

  test("streaming WARC ingest (manifest of archive paths) matches batch triples") {
    import spark.implicits._
    val (dir, pages) = writeCorpus(80, 4)
    // crawl-queue manifest: one landed-archive path per line
    val manifestDir = Files.createTempDirectory("graft-warc-manifest-")
    val paths = new java.io.File(dir).listFiles().map(_.getAbsolutePath).sorted
    Files.write(manifestDir.resolve("batch-000.txt"),
      paths.mkString("\n").getBytes("UTF-8"))

    val stream = graft.streaming.StreamingKg.triplesStream(
      spark, graft.streaming.StreamingKg.warcPages(spark, manifestDir.toString))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("warc_stream").start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("warc_stream")
      .select("subj", "pred", "obj").as[(String, String, String)].collect().toSet

    // the WARC path detects lang from the text (StreamingSpec pins that);
    // the batch side stamps "en" — mention extraction is lang-independent
    // under the deterministic annotator, so the triples must still match
    val batch = graft.streaming.StreamingKg.triplesStream(
      spark, spark.createDataset(pages).toDF().withColumn("lang", lit("en")))
      .select("subj", "pred", "obj").as[(String, String, String)].collect().toSet
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("length-framed parsing survives adversarial payload bytes (property)") {
    import org.scalacheck.{Gen, Prop}
    // payloads may contain CRLFCRLF runs and fake "WARC/1.0" markers — the
    // parser must frame by Content-Length, never by scanning payload bytes
    val evil = Gen.oneOf(
      Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray),
      Gen.const("\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\n".getBytes("UTF-8")),
      Gen.const(Array.empty[Byte]))
    val page = for {
      n <- Gen.chooseNum(1, 9999)
      body <- evil
    } yield (s"https://prop.example/doc/$n", body)
    val prop = Prop.forAll(Gen.listOfN(5, page)) { pages =>
      val parsed = Warc.parseRecords(Warc.writeWarc(pages))
        .filter(_.warc_type == "response").toList
      parsed.length == pages.length && parsed.zip(pages).forall {
        case (r, (url, body)) =>
          r.target_uri == url && Warc.httpBody(r.payload).sameElements(body)
      }
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  test("KG pipeline over WARC-read input matches the direct-table path") {
    import spark.implicits._
    val (dir, pages) = writeCorpus(120, 4)
    val direct = spark.createDataset(pages).toDF()

    // a WARC archive carries url+html; text_expected/lang come from the
    // catalog the crawl is joined against (here: the same deterministic
    // metadata, joined by url)
    val meta = spark.createDataset(pages.map(p => (p.url, p.text, p.lang)))
      .toDF("url", "text", "lang")
    val fromWarc = Warc.responses(spark, s"$dir/*.warc").join(meta, "url")
      .withColumn("warc_ts", lit(new java.sql.Timestamp(0L)))

    def run(df: org.apache.spark.sql.DataFrame): Set[(String, String, String)] = {
      val out = Files.createTempDirectory("graft-warc-kg-").toString
      val stats = KgPipeline.run(spark, df, KgPipeline.Config(out, numBuckets = 8))
      assert(stats.htmlMismatches == 0)
      spark.read.parquet(s"$out/triples").select("subj", "pred", "obj")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    }
    val a = run(direct)
    val b = run(fromWarc)
    assert(a.nonEmpty && a == b)
  }
}
