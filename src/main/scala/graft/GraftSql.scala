package graft

import graft.quality.TextQuality
import graft.text.PyStr
import org.apache.spark.sql.SparkSession

/** SQL surface for the engine — the reference has no SQL layer (SURVEY.md
  * intro); here every sf table becomes a temp view and the engine's scalar
  * functions register as SQL UDFs, so the full library drives from
  * `spark.sql(...)` as well as the Dataset API. */
object GraftSql {

  /** Named span struct for SQL results: array<struct<begin_c, end_c>>. */
  final case class Span(begin_c: Int, end_c: Int)

  val Tables: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register the sf-dir parquet tables as temp views. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    Tables.foreach { t =>
      spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
    }

  /** Register the engine's deterministic scalar functions for SQL use. */
  def registerFunctions(spark: SparkSession): Unit = {
    // find-resume span grounding (reference ai/extractor_ner.py:104-112);
    // returns array<struct<begin_c:int, end_c:int>>
    spark.udf.register("find_all", (text: String, needle: String) =>
      if (text == null || needle == null || needle.isEmpty) Array.empty[Span]
      else PyStr.findAll(text, needle).map { case (b, e) => Span(b, e) })
    // Python str.split() tokenization (drives BIO/token metrics)
    spark.udf.register("py_tokens", (s: String) =>
      if (s == null) Array.empty[String] else PyStr.split(s))
    // Python str.strip()
    spark.udf.register("py_strip", (s: String) =>
      if (s == null) null else PyStr.strip(s))
    // n-gram language id
    spark.udf.register("detect_lang", (s: String) =>
      if (s == null) "und" else TextQuality.detectLang(s))
    // 64-bit rolling fingerprint of normalized text
    spark.udf.register("fingerprint64", (s: String) =>
      if (s == null) 0L else TextQuality.fingerprint(s))
    // DuckDB-portable hash primitives (dedup's verifiable variants)
    spark.udf.register("md5_hash32", (s: String) =>
      if (s == null) 0L else graft.dedup.Dedup.md5Hash32(s))
    spark.udf.register("md5_hash64", (s: String) =>
      if (s == null) 0L else graft.dedup.Dedup.md5Hash64(s))
    // real JDK-codec media decode for SQL users: struct-typed metadata
    spark.udf.register("image_meta", (bytes: Array[Byte]) =>
      if (bytes == null) null else graft.multimodal.Media.decodeImage(bytes))
    spark.udf.register("wav_meta", (bytes: Array[Byte]) =>
      if (bytes == null) null else graft.multimodal.Media.decodeWav(bytes))
    // native Catalyst expression (codegen'd, no ScalaUDF boxing) — the
    // find-resume grounding as a first-class function
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "find_all_native",
      { children => graft.functions.FindAllSpans(children(0), children(1)) },
      "scala_udf")
  }

  def registerAll(spark: SparkSession, dir: String): Unit = {
    registerViews(spark, dir)
    registerFunctions(spark)
  }
}
