package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`ARRAY<FLOAT>`).
  *
  * Brute-force cosine top-k is the correctness baseline: a single narrow
  * scan + a `TakeOrdered` (no shuffle of the vectors themselves). The
  * LSH-bucketed variant is the 100 TB scale path: random-hyperplane signs
  * bucket the vectors so each query probes one bucket (plus neighbors)
  * instead of the full table.
  *
  * All arithmetic is done in doubles via codegen'd higher-order functions
  * (`zip_with` + `aggregate`) — no UDF in the hot path.
  */
object Ann {

  /** Cosine similarity column between an array column and a literal query
    * vector, computed with built-in HOFs. */
  def cosineCol(vecCol: String, query: Array[Double]): org.apache.spark.sql.Column = {
    val q = array(query.toIndexedSeq.map(lit): _*)
    val v = transform(col(vecCol), x => x.cast("double"))
    val dot = aggregate(zip_with(v, q, (a, b) => a * b), lit(0.0), (acc, x) => acc + x)
    val nv = sqrt(aggregate(transform(v, x => x * x), lit(0.0), (acc, x) => acc + x))
    val nq = math.sqrt(query.map(x => x * x).sum)
    dot / (nv * lit(nq))
  }

  /** Brute-force cosine top-k: (vec_id, sim) ordered by sim desc with a
    * deterministic vec_id tie-break. */
  def bruteForceTopK(embeddings: DataFrame, query: Array[Double], k: Int): DataFrame =
    embeddings
      .select(col("vec_id").cast("long"), cosineCol("embedding", query).as("sim"))
      .orderBy(desc("sim"), asc("vec_id"))
      .limit(k)

  /** Fixed-seed random hyperplanes — single source of truth so table-side
    * bucketing and query-side bucketing can never drift apart. */
  def hyperplanes(dim: Int, nBits: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(7)
    Array.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit bucket of one vector under the given hyperplanes. */
  def bucketOf(v: Array[Double], planes: Array[Array[Double]]): Int = {
    var bucket = 0
    var b = 0
    while (b < planes.length) {
      var dot = 0.0
      val p = planes(b)
      var i = 0
      while (i < v.length && i < p.length) { dot += v(i) * p(i); i += 1 }
      if (dot > 0) bucket |= (1 << b)
      b += 1
    }
    bucket
  }

  /** Random-hyperplane LSH bucket id (nBits sign bits) for each vector —
    * the scale path's partitioning key. Hyperplanes come from a fixed-seed
    * PRNG so bucketing is deterministic. */
  def lshBuckets(spark: SparkSession, embeddings: DataFrame, dim: Int, nBits: Int): DataFrame = {
    import spark.implicits._
    val planesB = spark.sparkContext.broadcast(hyperplanes(dim, nBits))
    embeddings.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])]
      .map { case (id, emb) =>
        (id, bucketOf(emb.map(_.toDouble).toArray, planesB.value))
      }
      .toDF("vec_id", "bucket")
  }

  /** One narrow pass computing `(vec_id, bucket, embedding)` — the bucket is
    * a pure function of the embedding, so it is computed inline instead of
    * joining the table against its own buckets (which would scan the
    * embeddings twice and add a vec_id shuffle). */
  def withLshBuckets(spark: SparkSession, embeddings: DataFrame,
      dim: Int, nBits: Int): DataFrame = {
    import spark.implicits._
    val planesB = spark.sparkContext.broadcast(hyperplanes(dim, nBits))
    embeddings.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])]
      .map { case (id, emb) =>
        (id, bucketOf(emb.map(_.toDouble).toArray, planesB.value), emb)
      }
      .toDF("vec_id", "bucket", "embedding")
  }

  /** Embedding-cosine near-duplicate pairs: LSH-bucket self-join generates
    * candidates (vectors agreeing on all sign bits), exact cosine verifies.
    * Output: (vec_a, vec_b, sim) with vec_a < vec_b, sim ≥ minSim, rounded.
    * Scale shape: ONE narrow scan computing the bucket inline, one shuffle
    * on the bucket key, pair fan-out only inside buckets (expected size
    * n / 2^nBits). All accumulation in doubles (matches [[cosineCol]]). */
  def cosineNearDupPairs(spark: SparkSession, embeddings: DataFrame,
      dim: Int, nBits: Int, minSim: Double): DataFrame = {
    import spark.implicits._
    val pairs = withLshBuckets(spark, embeddings, dim, nBits)
      .groupBy("bucket")
      .agg(collect_list(struct(col("vec_id"), col("embedding"))).as("members"))
      .filter(size(col("members")) > 1)
      .as[(Int, Seq[(Long, Seq[Float])])]
      .flatMap { case (_, members) =>
        val sorted = members.sortBy(_._1)
        for {
          i <- sorted.indices
          j <- (i + 1) until sorted.length
        } yield {
          val (ida, va) = sorted(i)
          val (idb, vb) = sorted(j)
          var dot, na, nb = 0.0
          var k = 0
          val n = math.min(va.length, vb.length)
          while (k < n) {
            val a = va(k).toDouble; val b = vb(k).toDouble
            dot += a * b; na += a * a; nb += b * b; k += 1
          }
          (ida, idb, dot / math.sqrt(na * nb))
        }
      }
      .toDF("vec_a", "vec_b", "sim")
    pairs.filter(col("sim") >= minSim)
      .groupBy("vec_a", "vec_b").agg(round(max("sim"), 4).as("sim"))
  }

  /** Buckets within Hamming distance `radius` of `bucket` (the multi-probe
    * sequence: exact bucket, then single-bit flips, then pairs, …). */
  def probeBuckets(bucket: Int, nBits: Int, radius: Int): Seq[Int] = {
    def flips(base: Int, startBit: Int, left: Int): Seq[Int] =
      if (left == 0) Seq(base)
      else (startBit until nBits).flatMap(b => flips(base ^ (1 << b), b + 1, left - 1)) :+ base
    flips(bucket, 0, radius).distinct
  }

  /** Multi-probe ANN top-k: restrict the brute-force scan to the query's LSH
    * bucket plus all buckets within Hamming distance `probeRadius` — the
    * standard multi-probe recall lever (each flipped sign bit admits vectors
    * on the far side of one hyperplane). One narrow scan computing buckets
    * inline, a bucket-set filter, then TakeOrdered — NO driver-side count
    * action and no full-table fallback in the query path (at 100 TB the
    * fallback WAS the scale-killer; raise `probeRadius` instead). */
  def lshTopK(spark: SparkSession, embeddings: DataFrame, query: Array[Double],
      k: Int, dim: Int, nBits: Int, probeRadius: Int = 1): DataFrame = {
    val qBucket = bucketOf(query, hyperplanes(dim, nBits))
    val probes = probeBuckets(qBucket, nBits, probeRadius)
    val candidates = withLshBuckets(spark, embeddings, dim, nBits)
      .filter(col("bucket").isin(probes: _*))
      .select(col("vec_id"), col("embedding"))
    bruteForceTopK(candidates, query, k)
  }
}
