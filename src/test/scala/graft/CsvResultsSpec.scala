package graft

import graft.sinks.CsvResults
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** Ports of the reference results-sink tests (`tests/test_utils.py:13-104`):
  * header on create, append, fieldname merge across runs. */
class CsvResultsSpec extends AnyFunSuite {

  private def tmp(): String =
    Files.createTempDirectory("graft-csv-").resolve("results.csv").toString

  private def read(path: String): Vector[String] = {
    import scala.jdk.CollectionConverters._
    Files.readAllLines(Paths.get(path)).asScala.toVector
  }

  test("creates file with header on first write") {
    val p = tmp()
    CsvResults.append(p, Map("model" -> "phi4", "micro_f1" -> "0.8662"))
    assert(read(p) == Vector("micro_f1,model", "0.8662,phi4"))
  }

  test("appends rows preserving existing header order") {
    val p = tmp()
    CsvResults.append(p, Map("model" -> "phi4", "micro_f1" -> "0.8662"))
    CsvResults.append(p, Map("model" -> "qwen", "micro_f1" -> "0.8458"))
    assert(read(p) == Vector("micro_f1,model", "0.8662,phi4", "0.8458,qwen"))
  }

  test("merges new fieldnames, padding old rows (utils.py:49-54)") {
    val p = tmp()
    CsvResults.append(p, Map("model" -> "phi4"))
    CsvResults.append(p, Map("model" -> "qwen", "dataset" -> "track2_en"))
    assert(read(p) == Vector("model,dataset", "phi4,", "qwen,track2_en"))
  }

  test("missing fields in later rows become empty cells") {
    val p = tmp()
    CsvResults.append(p, Map("a" -> "1", "b" -> "2"))
    CsvResults.append(p, Map("a" -> "3"))
    assert(read(p) == Vector("a,b", "1,2", "3,"))
  }
}
