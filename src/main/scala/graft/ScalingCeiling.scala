package graft

import graft.annotate.{DictAnnotator, MentionExtractor}
import graft.fixtures.WebTextGen
import graft.html.HtmlText
import graft.ner.NerSpark

import java.util.concurrent.{Callable, Executors, TimeUnit}

/** Diagnostic (not part of the driver contract): measures THIS HOST's
  * thread-scaling ceiling for the pipeline's pure per-doc work —
  * page synthesis → HTML→text extraction → mention extraction — with no
  * Spark, no parquet, no shuffle. If the end-to-end pipeline's N→4N
  * efficiency matches this ceiling, the residual gap is hardware
  * (DRAM bandwidth / SMT), not engine design (BASELINE.md §C).
  */
object ScalingCeiling {

  private val Sys = graft.annotate.Prompts.systemPrompt("en", NerSpark.Categories)

  private def run(nDocs: Int, threads: Int): Double = {
    val pool = Executors.newFixedThreadPool(threads)
    val chunk = nDocs / threads
    val t0 = System.nanoTime()
    val futures = (0 until threads).map { t =>
      pool.submit(new Callable[Long] {
        override def call(): Long = {
          val annotator = DictAnnotator(NerSpark.Dict)
          var acc = 0L
          var id = t.toLong * chunk
          val end = id + chunk
          while (id < end) {
            val p = WebTextGen.page(id)
            val text = HtmlText.extract(p.html)
            val ms = MentionExtractor.extract(annotator, Sys, NerSpark.Categories, text)
            acc += ms.size
            id += 1
          }
          acc
        }
      })
    }
    val total = futures.map(_.get()).sum
    pool.shutdown()
    pool.awaitTermination(1, TimeUnit.MINUTES)
    require(total > 0)
    (System.nanoTime() - t0) / 1e9
  }

  /** Best-of-`rounds` seconds for `nDocs` docs at each thread count —
    * reusable by [[Bench]] to report the live hardware ceiling next to the
    * pipeline's scaling number. */
  def measure(threadCounts: Seq[Int], nDocs: Int, rounds: Int): Map[Int, Double] = {
    run(math.min(nDocs, 50000), threadCounts.max) // JIT warm-up
    val best = scala.collection.mutable.Map.empty[Int, Double]
    (1 to rounds).foreach { _ =>
      threadCounts.foreach { t =>
        val sec = run(nDocs, t)
        best(t) = math.min(best.getOrElse(t, Double.MaxValue), sec)
      }
    }
    best.toMap
  }

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(400000)
    val rounds = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    run(50000, 32) // JIT warm-up
    val counts = Seq(1, 4, 8, 16, 32)
    val best = scala.collection.mutable.Map.empty[Int, Double]
    (1 to rounds).foreach { _ =>
      counts.foreach { t =>
        val sec = run(nDocs, t)
        best(t) = math.min(best.getOrElse(t, Double.MaxValue), sec)
        System.err.println(f"[ceiling] threads=$t%2d sec=$sec%6.2f")
      }
    }
    counts.foreach { t =>
      val tput = nDocs / best(t)
      println(f"[ceiling] threads=$t%2d best=${best(t)}%6.2f s docs/s=$tput%9.0f " +
        f"speedup_vs1=${best(1) / best(t)}%5.2f")
    }
    println(f"[ceiling] eff_4_16=${best(4) / (4 * best(16))}%.3f " +
      f"eff_8_32=${best(8) / (4 * best(32))}%.3f")
  }
}
