package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.util.hashing.MurmurHash3

/** Multimodal-column plumbing: image/audio/video travel as opaque `BINARY`
  * columns with typed metadata; decode / feature-extract / resize /
  * frame-sample run batched inside `mapPartitions` (the Scala analog of
  * `mapInPandas` — one iterator pass per partition, vectorizable batch
  * shape).
  *
  * NOTE: no image/audio codecs ship in this container, so the *decode* step
  * is a clearly-marked deterministic STUB (`decodeStub`): metadata and
  * features are pure functions of the bytes. The Spark-side contract —
  * schemas, partitioning, batch iteration, column shapes — is real and
  * tested; swapping `decodeStub` for a JNI/javacpp codec is the only change
  * needed on a real cluster.
  */
object Media {

  final case class MediaMeta(width: Int, height: Int, channels: Int, n_bytes: Long)

  /** STUB decode: deterministic fake dimensions + an 8-dim feature vector
    * derived from the byte content (stands in for a real decoder+embedder). */
  def decodeStub(bytes: Array[Byte]): (MediaMeta, Array[Float]) = {
    val h = MurmurHash3.bytesHash(bytes, 42)
    val rnd = new scala.util.Random(h)
    val meta = MediaMeta(
      width = 64 + math.floorMod(h, 16) * 64,
      height = 64 + math.floorMod(h >> 8, 16) * 64,
      channels = 3,
      n_bytes = bytes.length.toLong)
    val feat = Array.fill(8)(rnd.nextFloat())
    (meta, feat)
  }

  /** Decode + feature-extract a binary column, batched per partition.
    * Output: (id, width, height, channels, n_bytes, feat ARRAY<FLOAT>). */
  def decodeAndFeaturize(spark: SparkSession, df: DataFrame,
      idCol: String, binCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (m, feat) = decodeStub(bytes)
          (id, m.width, m.height, m.channels, m.n_bytes, feat)
        }
      }
      .toDF("id", "width", "height", "channels", "n_bytes", "feat")
  }

  /** STUB resize: recompute metadata for a target box, preserving aspect
    * ratio — metadata-only transform (a real impl would re-encode bytes). */
  def resizeMeta(df: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide).cast("double") / greatest(col("width"), col("height")))
    df.withColumn("out_width", ceil(col("width") * scale).cast("int"))
      .withColumn("out_height", ceil(col("height") * scale).cast("int"))
  }

  /** STUB frame sampling for video-like blobs: split the byte stream into
    * fixed-size pseudo-frames and keep every `stride`-th — exercises the
    * explode/fan-out shape of real frame extraction. */
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
