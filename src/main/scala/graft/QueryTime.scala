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
    // session mirrors Bench.session exactly — numbers measured here must
    // predict the frozen driver bench, so the local dir (tmpfs vs disk),
    // split size, and AQE settings all match
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    if (new java.io.File("/dev/shm").isDirectory)
      b.config("spark.local.dir", "/dev/shm/graft-spark-local")
    val spark = b.getOrCreate()
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
