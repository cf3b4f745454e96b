package graft

import graft.fixtures.WebTextGen
import graft.html.HtmlText
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: times each pipeline stage at local[8] vs local[32] to find
  * stages that fail to scale with cores. Not part of the driver contract. */
object ScalingProbe {
  private def session(cpus: Int): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"probe-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.ui.enabled", "false")
    if (new java.io.File("/dev/shm").isDirectory)
      b.config("spark.local.dir", "/dev/shm/graft-spark-local")
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 100000L
    val fullOnly = args.contains("full-only")
    val spc = args.find(_.startsWith("spc=")).map(_.drop(4).toInt).getOrElse(0)
    val order = if (args.contains("reverse")) Seq(32, 8) else Seq(8, 32)
    order.foreach { cpus =>
      val spark = session(cpus)
      import spark.implicits._

      def time[A](label: String)(f: => A): Unit = {
        val t0 = System.nanoTime()
        f
        println(f"[probe] cpus=$cpus $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }

      // warm-up
      WebTextGen.pages(spark, 5000, 64).toDF().agg(count(lit(1))).head()
      if (fullOnly) {
        val stageTimes = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, Int)]()
        spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            val dur = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L))
            stageTimes.put(si.stageId, (si.name.split("\n").head.take(60), dur, si.numTasks))
          }
        })
        // same shape as Bench.timePipeline: bucket-aligned Iceberg-style
        // input, tmpfs output
        val base = if (new java.io.File("/dev/shm").isDirectory) "/dev/shm"
                   else System.getProperty("java.io.tmpdir")
        def runOnce(): Unit = {
          val out = java.nio.file.Files
            .createTempDirectory(java.nio.file.Paths.get(base), "probe-").toString
          val pages = WebTextGen.pagesBucketed(spark, n, 64)
          graft.kg.KgPipeline.run(spark, pages, graft.kg.KgPipeline.Config(out,
            numBuckets = 64, sentencesPerCall = spc,
            useInputBucketColumn = true, alignedInput = true))
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
        }
        time("full-pipeline")(runOnce())
        time("full-pipeline-2nd")(runOnce())
        Thread.sleep(500)
        import scala.jdk.CollectionConverters._
        stageTimes.asScala.toSeq.sortBy(-_._2._2).take(12).foreach {
          case (id, (name, dur, tasks)) =>
            println(f"[probe] cpus=$cpus stage=$id%4d ${dur / 1000.0}%7.2f s tasks=$tasks%3d  $name")
        }
        spark.stop()
      } else {

      time("gen") {
        WebTextGen.pages(spark, n, 64).toDF()
          .agg(sum(length($"text"))).head()
      }
      time("gen+htmlextract") {
        WebTextGen.pages(spark, n, 64)
          .map(p => HtmlText.extract(p.html).length)
          .agg(sum($"value")).head()
      }
      time("gen+mentions") {
        val pages = WebTextGen.pages(spark, n, 64).toDF()
          .select(xxhash64($"url").as("doc_id"), $"text")
        graft.ner.NerSpark.mentions(spark, pages).agg(count(lit(1))).head()
      }
      locally {
        val pages = WebTextGen.pages(spark, n, 64).toDF()
          .withColumn("bucket", graft.kg.KgPipeline.bucketCol(64))
        val mentions = graft.ner.NerSpark.mentions(spark,
            pages.select(xxhash64($"url").as("doc_id"), $"text"))
          .withColumn("url", $"doc_id".cast("string"))
          .withColumn("bucket", pmod($"doc_id", lit(64)))
        val aliasDf = graft.kg.Kg.AliasesExtended.toDF("alias", "entity_id", "score")
        val linked = graft.kg.Kg.disambiguate(
          mentions.join(broadcast(aliasDf), lower(trim($"surface")) === $"alias", "left"))
        val triples = linked.select($"entity_id".as("subj"), $"category".as("pred"),
          concat(lit("page://"), $"url").as("obj"), $"url", $"bucket").distinct()
        time("linked+triples.count") { triples.count() }
        time("write-flat") {
          val out = java.nio.file.Files.createTempDirectory("probe-").toString
          triples.write.parquet(s"$out/t")
        }
        time("write-partitionBy") {
          val out = java.nio.file.Files.createTempDirectory("probe-").toString
          triples.write.partitionBy("bucket").parquet(s"$out/t")
        }
        time("write-repart+partBy") {
          val out = java.nio.file.Files.createTempDirectory("probe-").toString
          triples.repartition(64, $"bucket").write.partitionBy("bucket").parquet(s"$out/t")
        }
      }
      time("full-pipeline") {
        val out = java.nio.file.Files.createTempDirectory("probe-").toString
        val pages = WebTextGen.pages(spark, n, 64).toDF()
        graft.kg.KgPipeline.run(spark, pages, graft.kg.KgPipeline.Config(out, numBuckets = 64, sentencesPerCall = spc))
      }
      spark.stop()
      }
    }
  }
}
