package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degree assortativity of an undirected graph — the Pearson correlation
  * of endpoint degrees over the edge list (Newman '02). The one-number
  * mixing diagnostic a KG builder reads before choosing join strategy for
  * graph workloads: assortative graphs (hubs link hubs, r > 0) keep hot
  * keys colliding in the same partitions — the salting/AQE-skew case —
  * while disassortative ones (hubs link leaves, r < 0, the typical web
  * and entity-mention shape) spread hub edges across partitions naturally.
  *
  * Scale shape: degrees are one map-side-combined aggregate; attaching
  * them to both endpoints is two joins against the vocabulary-sized degree
  * relation (AQE broadcasts when it fits); the correlation itself is
  * Spark's codegen'd `corr` aggregate over both edge orientations (each
  * undirected edge contributes its (d_u, d_v) AND (d_v, d_u) pair — the
  * standard symmetrization, so the measure is orientation-free). Output
  * is a single row; nothing returns to the driver but the scalar.
  */
object Assortativity {

  /** `(n_edges, assortativity)` over the canonical (u<v, distinct) edge
    * list, correlation rounded to 4 decimals. Degenerate graphs where
    * either degree margin is constant (e.g. a perfect matching or a
    * single edge) have no defined correlation — reported as null, as both
    * engines' `corr` return. */
  def run(canonical: DataFrame): DataFrame = {
    val deg = Triangles.degreesOf(canonical)
    val sym = canonical.select(col("u"), col("v"))
      .union(canonical.select(col("v").as("u"), col("u").as("v")))
    sym
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
      .agg((count(lit(1)) / 2).cast("long").as("n_edges"),
        round(corr(col("du").cast("double"), col("dv").cast("double")), 4)
          .as("assortativity"))
  }

  /** Log₂-binned degree histogram — the power-law diagnostic read next to
    * [[run]]: bucket `⌊log₂ d⌋` with node count and exact degree range per
    * bucket. A straight line across the buckets (log-log) is the
    * heavy-tail signature that says "salt the hot keys"; a bell says the
    * uniform-partition default is fine. Output is ~log₂(max-degree) rows
    * from one map-side-combined aggregate over the degree relation. */
  def degreeHistogram(canonical: DataFrame): DataFrame =
    Triangles.degreesOf(canonical)
      // ⌊log₂ d⌋ via binary-digit count, NOT float log2: libm log2 of an
      // exact power of two can land a hair under the integer on one
      // engine and exactly on it on the other, flipping boundary buckets
      .groupBy((length(bin(col("d"))) - 1).cast("int").as("bucket"))
      .agg(count(lit(1)).as("n_nodes"),
        min(col("d")).as("d_min"), max(col("d")).as("d_max"))

  /** [[degreeHistogram]] as SQL; same canonical-edge contract (and the
    * same integer-exact bit-length bucket, not float log2). */
  def histogramOracleSql(edgesSql: String): String =
    s"""WITH edges AS MATERIALIZED ($edgesSql),
       | und AS (SELECT u AS w FROM edges UNION ALL SELECT v AS w FROM edges),
       | deg AS (SELECT w, count(*) AS d FROM und GROUP BY w)
       | SELECT (length(bin(d)) - 1)::int AS bucket, count(*) AS n_nodes,
       |  min(d) AS d_min, max(d) AS d_max
       | FROM deg GROUP BY 1""".stripMargin.replaceAll("\n", " ")

  /** The identical computation as SQL; `edgesSql` must yield distinct
    * (u, v) with u < v. */
  def oracleSql(edgesSql: String): String =
    s"""WITH edges AS MATERIALIZED ($edgesSql),
       | und AS (SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges),
       | deg AS (SELECT w, count(*) AS d FROM
       |   (SELECT u AS w FROM und) GROUP BY w)
       | SELECT (count(*) / 2)::BIGINT AS n_edges,
       |  round(corr(d1.d, d2.d), 4) AS assortativity
       | FROM und JOIN deg d1 ON d1.w = und.u JOIN deg d2 ON d2.w = und.v"""
      .stripMargin.replaceAll("\n", " ")
}
