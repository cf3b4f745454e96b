package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream
import javax.imageio.ImageIO
import javax.sound.sampled.AudioSystem
import scala.util.hashing.MurmurHash3

/** Multimodal-column plumbing: image/audio/video travel as opaque `BINARY`
  * columns with typed metadata; decode / feature-extract / resize /
  * frame-sample run batched inside `mapPartitions` (the Scala analog of
  * `mapInPandas` — one iterator pass per partition, vectorizable batch
  * shape).
  *
  * Decode is REAL, via the JDK's own codecs (zero extra dependencies):
  * `javax.imageio` for PNG/BMP images and `javax.sound.sampled` for
  * RIFF/WAV PCM audio. "Video" is a concatenated-PNG container (an
  * MJPEG-like stream we split on the PNG signature) — per-frame decode is
  * a real parse+decode, only the container format is simplified. On a
  * production cluster the per-batch decode body swaps for a vectorized
  * native codec; every Spark-facing shape (schemas, partitioning, batch
  * iteration, fan-out) stays as written here.
  *
  * Reference context: the reference pipeline is text-only
  * (ref: ai/extractor_ner.py) — this module is one of the engine-added
  * training-data-pipeline families (SURVEY.md §2, "multimodal columns").
  */
object Media {

  // in-memory codec streams: the default ImageIO path spools every
  // encode/decode through a temp FILE — a per-record disk write inside a
  // Spark task (once per JVM; object init runs on each executor)
  ImageIO.setUseCache(false)

  /** Decoded image: real dimensions + raster band count + per-channel mean
    * (the 3-dim "feature" of the decode step; rounded to 4 decimals so the
    * value survives a float column round-trip bit-exactly). */
  final case class ImageMeta(width: Int, height: Int, channels: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  def decodeImage(bytes: Array[Byte]): ImageMeta = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "not a decodable image")
    val (w, h) = (img.getWidth, img.getHeight)
    var (sr, sg, sb) = (0L, 0L, 0L)
    // bulk row reads: per-pixel getRGB pays a color-model conversion call
    // per pixel (~10× slower than the batched form)
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val rgb = row(x)
        sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    def r4(v: Double) = math.rint(v * 10000) / 10000
    ImageMeta(w, h, img.getRaster.getNumBands,
      r4(sr.toDouble / n), r4(sg.toDouble / n), r4(sb.toDouble / n))
  }

  /** Real resize (nearest-neighbor re-encode to PNG), aspect-preserving
    * within a `maxSide` box; identity when the image already fits. The
    * target-dim formula matches [[resizeMeta]] exactly. */
  def resizeImage(bytes: Array[Byte], maxSide: Int): Array[Byte] = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "not a decodable image")
    val (w, h) = (img.getWidth, img.getHeight)
    if (math.max(w, h) <= maxSide) return bytes
    val scale = maxSide.toDouble / math.max(w, h)
    val (ow, oh) = (math.ceil(w * scale).toInt, math.ceil(h * scale).toInt)
    val out = new BufferedImage(ow, oh, BufferedImage.TYPE_3BYTE_BGR)
    val g = out.createGraphics()
    try g.drawImage(img, 0, 0, ow, oh, null) finally g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    ImageIO.write(out, "png", bos)
    bos.toByteArray
  }

  /** Decode + feature-extract an image binary column, batched per
    * partition, then REAL resize into `maxSide` and re-decode the resized
    * bytes — `out_width`/`out_height` are read back from the re-encoded
    * image, not computed from metadata, so the whole
    * encode→decode→resize→decode round-trip is under test. */
  def imageFeatures(spark: SparkSession, df: DataFrame,
      idCol: String, binCol: String, maxSide: Int): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val m = decodeImage(bytes)
          val resized = decodeImage(resizeImage(bytes, maxSide))
          (id, m.width, m.height, m.channels, bytes.length.toLong,
            resized.width, resized.height, m.mean_r, m.mean_g, m.mean_b)
        }
      }
      .toDF("id", "width", "height", "channels", "n_bytes",
        "out_width", "out_height", "mean_r", "mean_g", "mean_b")
  }

  /** Metadata-only resize of already-decoded dimensions (no bytes touched) —
    * the planning-time variant of [[resizeImage]], same formula. */
  def resizeMeta(df: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide).cast("double") / greatest(col("width"), col("height")))
    df.withColumn("out_width", ceil(col("width") * scale).cast("int"))
      .withColumn("out_height", ceil(col("height") * scale).cast("int"))
  }

  /** Decoded PCM audio: format header fields + exact frame count + peak
    * (max |sample|) + RMS over all samples, all decoded with the JDK's
    * RIFF/WAV codec and a real pass over the PCM payload. */
  final case class AudioMeta(sample_rate: Int, channels: Int, bits: Int,
      n_frames: Long, peak: Int, rms: Double)

  def decodeWav(bytes: Array[Byte]): AudioMeta = {
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16, "only 16-bit PCM supported")
      val data = in.readAllBytes()
      val bb = java.nio.ByteBuffer.wrap(data).order(
        if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
        else java.nio.ByteOrder.LITTLE_ENDIAN)
      var peak = 0
      var sumSq = 0.0
      var n = 0L
      while (bb.remaining() >= 2) {
        val s = bb.getShort.toInt
        if (math.abs(s) > peak) peak = math.abs(s)
        sumSq += s.toDouble * s
        n += 1
      }
      AudioMeta(fmt.getSampleRate.toInt, fmt.getChannels, fmt.getSampleSizeInBits,
        in.getFrameLength, peak, if (n == 0) 0.0 else math.sqrt(sumSq / n))
    } finally in.close()
  }

  /** Decode a WAV binary column, batched per partition. */
  def audioMeta(spark: SparkSession, df: DataFrame,
      idCol: String, binCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val m = decodeWav(bytes)
          (id, m.sample_rate, m.channels, m.bits, m.n_frames, m.peak,
            math.rint(m.rms * 100) / 100)
        }
      }
      .toDF("id", "sample_rate", "channels", "bits", "n_frames", "peak", "rms")
  }

  private val PngSig = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  /** Split a concatenated-PNG "video" container into its frames (real
    * signature parse, no length heuristics). */
  def splitPngFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val starts = (0 to bytes.length - PngSig.length).filter { i =>
      var k = 0
      while (k < PngSig.length && bytes(i + k) == PngSig(k)) k += 1
      k == PngSig.length
    }
    starts.zipAll(starts.drop(1), 0, bytes.length).map { case (a, b) =>
      java.util.Arrays.copyOfRange(bytes, a, b)
    }
  }

  /** Sample every `stride`-th frame of a concatenated-PNG video column and
    * REALLY decode each kept frame — output `(id, frame_idx, width, height,
    * mean_r)`. Fan-out (flatMap) per row, decode only on kept frames: the
    * stride prunes decode work, as a production frame sampler must. */
  def sampleVideoFrames(spark: SparkSession, df: DataFrame, idCol: String,
      binCol: String, stride: Int): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        splitPngFrames(bytes).zipWithIndex
          .filter(_._2 % stride == 0)
          .map { case (frame, idx) =>
            val m = decodeImage(frame)
            (id, idx, m.width, m.height, m.mean_r)
          }
      }
      .toDF("id", "frame_idx", "width", "height", "mean_r")
  }

  /** Byte-stream frame sampling for opaque blobs (no codec assumed): split
    * into fixed-size pseudo-frames, keep every `stride`-th — the pure
    * fan-out shape, used where only byte-level lineage is needed. */
  def sampleFrames(spark: SparkSession, df: DataFrame, idCol: String,
      binCol: String, frameBytes: Int, stride: Int): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        bytes.grouped(frameBytes).zipWithIndex
          .filter(_._2 % stride == 0)
          .map { case (frame, idx) => (id, idx, frame.length, MurmurHash3.bytesHash(frame, 7)) }
      }
      .toDF("id", "frame_idx", "frame_bytes", "frame_hash")
  }
}
