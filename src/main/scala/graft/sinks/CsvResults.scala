package graft.sinks

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Append-with-header-merge CSV results sink — exact semantics of the
  * reference's experiment-results writer (`utils.py:14-62`, SURVEY.md §2
  * op 20): create the file with a header on first write; on append, union
  * the existing header's fieldnames with the new row's fields PRESERVING
  * ORDER (existing fields first, new fields appended — sorted here for
  * determinism where the reference uses dict insertion order), rewriting
  * the file when the header grows; missing values are empty cells.
  *
  * This is a driver-side results file (one row per experiment), not a data
  * sink — corpus-scale output goes through the Parquet writers.
  */
object CsvResults {

  private def parseCsvLine(line: String): Vector[String] = {
    // minimal CSV: our writers quote nothing and values never contain commas
    if (line.isEmpty) Vector.empty else line.split(",", -1).toVector
  }

  def append(path: String, row: Map[String, String]): Unit = {
    val p = Paths.get(path)
    val (header, rows): (Vector[String], Vector[Vector[String]]) =
      if (Files.exists(p)) {
        val lines = Files.readAllLines(p, StandardCharsets.UTF_8).asScala.toVector
        if (lines.isEmpty) (Vector.empty, Vector.empty)
        else (parseCsvLine(lines.head), lines.tail.map(parseCsvLine))
      } else (Vector.empty, Vector.empty)

    // fieldname union preserving order (reference utils.py:49-54)
    val merged = header ++ row.keys.toVector.sorted.filterNot(header.contains)
    val padded = rows.map(r => r.padTo(merged.length, ""))
    val newRow = merged.map(f => row.getOrElse(f, ""))

    val out = (merged.mkString(",") +:
      (padded :+ newRow).map(_.mkString(","))).mkString("\n") + "\n"
    Option(p.getParent).foreach(Files.createDirectories(_))
    Files.write(p, out.getBytes(StandardCharsets.UTF_8))
  }
}
