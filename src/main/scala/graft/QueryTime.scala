package graft

import org.apache.spark.sql.SparkSession

/** Dev diagnostic: time individual SparkEntry queries without running the
  * whole Bench sweep. `runMain graft.QueryTime <sfDir> <n> <query>...` —
  * prints per-attempt and min seconds (min-of-N, same noise defense as
  * Bench part 1). */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = args(1).toInt
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/documents.parquet").count() // warm-up
    names.foreach { name =>
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[qtime] $name min=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
