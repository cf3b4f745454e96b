package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL face of the engine: same semantics as the Dataset API, driven
  * entirely through `spark.sql`. */
class GraftSqlSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-sql-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSql.registerAll(s, sf)
    s
  }

  test("find_all UDF grounds spans through SQL exactly like the extractor") {
    val rows = spark.sql(
      """SELECT doc_id, s.begin_c, s.end_c
        |FROM documents
        |LATERAL VIEW explode(find_all(text, 'spark')) AS s
        |""".stripMargin).collect()
    assert(rows.nonEmpty)
    // cross-check against the Dataset-API mentions query
    val viaApi = SparkEntry.queries("q10_ner_mentions")(spark, sf)
      .filter(org.apache.spark.sql.functions.col("surface") === "spark")
      .count()
    assert(rows.length.toLong == viaApi)
  }

  test("py_tokens matches Python str.split() through SQL") {
    val r = spark.sql("SELECT py_tokens('  a\tb  c ') AS t").head()
    assert(r.getSeq[String](0) == Seq("a", "b", "c"))
  }

  test("SQL join + agg over registered views") {
    val n = spark.sql(
      """SELECT c_mktsegment, count(*) AS n FROM orders
        |JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment
        |""".stripMargin).count()
    assert(n > 0)
  }

  test("md5 hash primitives and media decode run in SQL") {
    val r = spark.sql("SELECT md5_hash32('abc') AS h32, md5_hash64('spark') AS h64").head()
    assert(r.getLong(0) == 2416005272L && r.getLong(1) == 7293996656543585851L)

    spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(7L, graft.fixtures.MediaGen.pngFor(7L))),
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, blob BINARY"))
      .createOrReplaceTempView("img")
    val m = spark.sql("SELECT image_meta(blob).width AS w, image_meta(blob).mean_r AS r FROM img").head()
    assert(m.getInt(0) == graft.fixtures.MediaGen.imgWidth(7L))
    assert(m.getDouble(1) == graft.fixtures.MediaGen.imgR(7L).toDouble)
  }

  test("find_all_native is a codegen'd Catalyst expression with find-resume semantics") {
    import spark.implicits._
    // resume-at-END: "aa" over "aaaa" gives [0,2) and [2,4), never [1,3)
    val got = spark.sql("SELECT find_all_native('aaaa', 'aa') AS s")
      .selectExpr("explode(s) AS x").select("x.begin_c", "x.end_c")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(got == Seq((0, 2), (2, 4)))
    // differential vs the fuzz-proven scalar on varied strings
    val rnd = new scala.util.Random(3)
    (1 to 50).foreach { _ =>
      val t = (0 until 30).map(_ => "ab ba aab".charAt(rnd.nextInt(9))).mkString
      val n = Seq("a", "ab", "aa", "b ")(rnd.nextInt(4))
      val viaSql = spark.sql(s"SELECT find_all_native('$t', '$n') AS s")
        .selectExpr("explode(s) AS x").select("x.begin_c", "x.end_c")
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
      assert(viaSql == graft.text.PyStr.findAll(t, n).toSeq, s"text='$t' needle='$n'")
    }
    // native expression, not a ScalaUDF: no UDF boxing node in the plan
    val plan = spark.sql(
      "SELECT explode(find_all_native(text, 'spark')) FROM documents")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEval"))
    assert(plan.contains("find_all_native"))
  }

  test("detect_lang and fingerprint64 register and run in SQL") {
    val r = spark.sql(
      "SELECT detect_lang('the house and the garden') AS l, fingerprint64('A  b') = fingerprint64('a b') AS same")
      .head()
    assert(r.getString(0) == "en")
    assert(r.getBoolean(1))
  }
}
