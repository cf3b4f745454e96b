package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the coarse-quantizer
  * scale path beside [[Ann]]'s LSH variant: k-means cells partition the
  * vector table, a query probes only its `nProbe` nearest cells, and exact
  * cosine re-ranks the survivors.
  *
  * Training is deliberately DRIVER-SIDE over a deterministic sample
  * (smallest `vec_id`s) — exactly how production IVF trains (faiss fits the
  * quantizer on a subsample, never the full corpus), and it makes the
  * centroids a pure function of the input: fixed seeds (the first k sample
  * vectors), fixed iteration count, `(distance, cell)` tie-break, empty
  * cells keep their previous centroid. The distributed part — cell
  * assignment, probing, re-rank — is a narrow broadcast map + a pruned
  * scan, the same shape that works at 100 TB. Determinism lets the DuckDB
  * oracle replay the whole SEARCH path from centroid literals
  * (assignment arg-min, probe selection, cosine top-k).
  */
object Ivf {

  /** Deterministic Lloyd's: seeds = k evenly-spaced sample vectors (first-k
    * seeding collapses when the sample is ordered by cluster — spaced picks
    * cover the data), `iters` rounds, sequential accumulation (stable float
    * order). */
  def train(vectors: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    require(vectors.length >= k, s"need >= $k training vectors")
    val dim = vectors(0).length
    var cent = Array.tabulate(k)(i => vectors((i.toLong * vectors.length / k).toInt).clone())
    (1 to iters).foreach { _ =>
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      vectors.foreach { v =>
        val cell = nearestCell(v, cent)
        counts(cell) += 1
        var d = 0
        while (d < dim) { sums(cell)(d) += v(d); d += 1 }
      }
      cent = Array.tabulate(k) { c =>
        if (counts(c) == 0) cent(c) // empty cell keeps its centroid
        else sums(c).map(_ / counts(c))
      }
    }
    cent
  }

  /** Arg-min cell by squared euclidean distance, ties to the lower cell id
    * (strict `<` while scanning cells in order). */
  def nearestCell(v: Array[Double], cent: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cent.length) {
      var d = 0.0
      val cc = cent(c)
      var i = 0
      while (i < v.length && i < cc.length) {
        val x = v(i) - cc(i); d += x * x; i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** The `nProbe` cells nearest to a query vector, by (distance, cell). */
  def probeCells(q: Array[Double], cent: Array[Array[Double]], nProbe: Int): Seq[Int] =
    cent.indices
      .map { c =>
        var d = 0.0
        var i = 0
        while (i < q.length && i < cent(c).length) {
          val x = q(i) - cent(c)(i); d += x * x; i += 1
        }
        (d, c)
      }
      .sorted.take(nProbe).map(_._2)

  /** Train centroids from the first `sampleN` vec_ids (driver-side). */
  def centroidsFor(spark: SparkSession, embeddings: DataFrame, k: Int,
      iters: Int, sampleN: Int): Array[Array[Double]] = {
    val sample = embeddings
      .select(col("vec_id").cast("long"), col("embedding"))
      .orderBy("vec_id").limit(sampleN)
      .collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    train(sample, k, iters)
  }

  /** One narrow pass computing `(vec_id, cell, embedding)` under broadcast
    * centroids — the IVF analog of [[Ann.withLshBuckets]]. */
  def withCells(spark: SparkSession, embeddings: DataFrame,
      cent: Array[Array[Double]]): DataFrame = {
    import spark.implicits._
    val centB = spark.sparkContext.broadcast(cent)
    embeddings.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])]
      .map { case (id, emb) =>
        (id, nearestCell(emb.map(_.toDouble).toArray, centB.value), emb)
      }
      .toDF("vec_id", "cell", "embedding")
  }

  /** IVF top-k: probe the query's `nProbe` nearest cells, exact cosine
    * re-rank inside them. No full-table fallback — raise `nProbe` for
    * recall, exactly like [[Ann.lshTopK]]'s probeRadius. */
  def ivfTopK(spark: SparkSession, embeddings: DataFrame, query: Array[Double],
      k: Int, nCells: Int, iters: Int, nProbe: Int, sampleN: Int): DataFrame = {
    val cent = centroidsFor(spark, embeddings, nCells, iters, sampleN)
    val probes = probeCells(query, cent, nProbe)
    val candidates = withCells(spark, embeddings, cent)
      .filter(col("cell").isin(probes: _*))
      .select(col("vec_id"), col("embedding"))
    Ann.bruteForceTopK(candidates, query, k)
  }

  /** Centroids as SQL VALUES `(cell, c DOUBLE[])` for the oracle. */
  def centroidValues(cent: Array[Array[Double]]): String =
    cent.zipWithIndex.map { case (c, i) =>
      s"($i, [${c.mkString(",")}]::DOUBLE[])"
    }.mkString("(VALUES ", ", ", ")")
}
