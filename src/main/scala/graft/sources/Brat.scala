package graft.sources

import graft.text.PyStr
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BRAT standoff-annotation source — the reference's entire input layer
  * (reference `datasets_info/utils/brat.py:6-43` plus the track-1 variant at
  * `datasets_info/multicardioner_track1.py:10-41`). A corpus directory holds
  * `X.txt` (raw UTF-8 text) / `X.ann` (tab-separated standoff) pairs; the
  * loader reads both sides with `spark.read.option("wholetext")` and joins
  * on the filename stem — fully distributed, no driver-side file loop, so
  * the same code reads a 250-doc reference corpus or a blob-store corpus
  * partitioned across a cluster.
  *
  * Parser semantics honored exactly (`brat.py:25-38`):
  *   - only lines starting with `"T"` (entity annotations);
  *   - the default variant skips any line containing `"#"` (guards against
  *     AnnotatorNotes text, `brat.py:27-28`); the track-1 variant does not
  *     skip and accepts `>= 3` tab fields (`multicardioner_track1.py:31`);
  *   - `line.strip()` then exactly 3 tab fields: id, "<CAT> <start> <end>"
  *     (whitespace-split), surface text;
  *   - document text is the file content Python-`strip()`ped
  *     (`brat.py:20-21`).
  * Discontinuous spans (`;`-separated) would crash the reference's tuple
  * unpack; the shipped corpora contain zero of them, and this parser drops
  * such lines instead of throwing.
  */
object Brat {

  final case class GoldEntity(category: String, surface: String, begin: Int, end: Int)

  /** `== 3` tab fields + skip-`#` (reference `brat.py`); `GE3` = `>= 3`
    * fields, no `#` skip (reference `multicardioner_track1.py`). */
  sealed trait Variant
  case object Exact3 extends Variant
  case object GE3 extends Variant

  /** Parse one `.ann` file's content. */
  def parseAnn(content: String, variant: Variant): Seq[GoldEntity] =
    content.split("\n", -1).toSeq.flatMap { line =>
      if (!line.startsWith("T")) None
      else if (variant == Exact3 && line.contains("#")) None
      else {
        val parts = PyStr.strip(line).split("\t", -1)
        val fieldsOk = variant match {
          case Exact3 => parts.length == 3
          case GE3    => parts.length >= 3
        }
        if (!fieldsOk) None
        else {
          val span = PyStr.split(parts(1))
          if (span.length != 3) None // discontinuous span — see scaladoc
          else
            try Some(GoldEntity(span(0), parts(2), span(1).toInt, span(2).toInt))
            catch { case _: NumberFormatException => None }
        }
      }
    }

  /** Filename stem of a file URI/path: strip directories and the extension. */
  def stem(path: String): String = {
    val base = path.substring(path.lastIndexOf('/') + 1)
    val dot = base.lastIndexOf('.')
    if (dot < 0) base else base.substring(0, dot)
  }

  /** One row per file, INCLUDING zero-byte files. Neither `text(wholetext)`
    * nor `binaryFile` emits a row for an empty file (no splits), which
    * silently dropped the ~30 unannotated track-2 docs (empty `.ann`)
    * through the downstream inner join — so the glob is listed explicitly
    * via the Hadoop FileSystem (exactly what Spark's FileIndex does, and
    * HDFS/S3-portable) and contents are read inside tasks. */
  private def wholeFiles(spark: SparkSession, glob: String): DataFrame = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(glob)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val files = Option(fs.globStatus(p)).getOrElse(Array.empty)
      .map(_.getPath.toString).toSeq.sorted
    // the SESSION's Hadoop conf rides to the executors (the
    // FileSourceScanExec pattern) — spark.hadoop.* settings (S3
    // credentials, fs overrides) must reach the task-side opens
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf()))
    spark.createDataset(files)
      .repartition(math.max(1, math.min(files.size, spark.sparkContext.defaultParallelism)))
      .mapPartitions { it =>
        val conf = confBc.value.value
        it.map { pathStr =>
          val path = new org.apache.hadoop.fs.Path(pathStr)
          val in = path.getFileSystem(conf).open(path)
          val bytes =
            try org.apache.commons.io.IOUtils.toByteArray(in)
            finally in.close()
          (pathStr, new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
        }
      }
      .toDF("path", "content")
  }

  /** Load one BRAT corpus directory into
    * `(doc_id STRING, text STRING, gold ARRAY<STRUCT<category,surface,begin,end>>)`.
    * `gold` is null when the doc has no entities — the reference's
    * `entities if entities else None` (`brat.py:43`).
    *
    * @param requireText  drop `.ann` files without a `.txt` twin (all
    *        reference loaders check `txt_file.exists()`); both shipped
    *        layouts are fully paired, so inner join either way
    * @param dropNoGold   PharmaCoNER keeps only annotated docs
    *        (`pharmaconer.py:36-37`) */
  def load(spark: SparkSession, dir: String, variant: Variant = Exact3,
      dropNoGold: Boolean = false): DataFrame = {
    import spark.implicits._
    val txt = wholeFiles(spark, s"$dir/*.txt")
      .as[(String, String)]
      .map { case (p, c) => (stem(p), PyStr.strip(c)) }
      .toDF("doc_id", "text")
    val ann = wholeFiles(spark, s"$dir/*.ann")
      .as[(String, String)]
      .map { case (p, c) => (stem(p), parseAnn(c, variant)) }
      .toDF("doc_id", "gold")
    val joined = txt.join(ann, Seq("doc_id"), "inner")
      .withColumn("gold", when(size(col("gold")) > 0, col("gold")))
    if (dropNoGold) joined.filter(col("gold").isNotNull) else joined
  }

  /** The five reference corpora (`main.py:30-48` registry), rooted at the
    * read-only reference checkout. */
  final case class CorpusDef(name: String, dir: String, lang: String,
      variant: Variant, dropNoGold: Boolean)

  val ReferenceRoot = "/root/reference/datasets"

  val Corpora: Seq[CorpusDef] = Seq(
    CorpusDef("multicardioner_track1",
      s"$ReferenceRoot/multicardioner-track1/cardioccc_test/brat", "es", GE3, dropNoGold = false),
    CorpusDef("multicardioner_track2_en",
      s"$ReferenceRoot/multicardioner-track2/en/brat", "en", Exact3, dropNoGold = false),
    CorpusDef("multicardioner_track2_es",
      s"$ReferenceRoot/multicardioner-track2/es/brat", "es", Exact3, dropNoGold = false),
    CorpusDef("multicardioner_track2_it",
      s"$ReferenceRoot/multicardioner-track2/it/brat", "it", Exact3, dropNoGold = false),
    CorpusDef("pharmaconer",
      s"$ReferenceRoot/PharmaCoNERCorpus/test", "es", Exact3, dropNoGold = true))

  /** All corpora unioned with a `dataset` discriminator column. */
  def loadAll(spark: SparkSession): DataFrame =
    Corpora.map { c =>
      load(spark, c.dir, c.variant, c.dropNoGold)
        .select(lit(c.name).as("dataset"), col("doc_id"), col("text"), col("gold"))
    }.reduce(_ unionByName _)

  /** Dataset statistics — reference `statistics_datasets.py:11-43`:
    * per corpus, doc count, mean/std of text length, mean/std of gold
    * entities per doc. numpy `std` is population std → `stddev_pop`. */
  def statistics(spark: SparkSession): DataFrame =
    loadAll(spark)
      .select(col("dataset"), length(col("text")).as("n_chars"),
        coalesce(size(col("gold")), lit(0)).as("n_entities"))
      .groupBy("dataset")
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg(col("n_chars")), 4).as("avg_text_length"),
        round(stddev_pop(col("n_chars")), 4).as("std_text_length"),
        round(avg(col("n_entities")), 4).as("avg_entities"),
        round(stddev_pop(col("n_entities")), 4).as("std_entities"))

  /** TSV gold reader (SURVEY §1.3 item 2): the track-2 release's
    * `filename  label  start_span  end_span  text` files — the natural
    * golden-output format for span tests. */
  def loadTsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("sep", "\t").option("header", "true").csv(path)
      .select(col("filename"), col("label"),
        col("start_span").cast("int"), col("end_span").cast("int"), col("text"))
}
