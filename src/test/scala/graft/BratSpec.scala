package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.core.Mention
import graft.sources.Brat
import graft.text.Tokenize
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Real-corpus parity for the BRAT source (SURVEY §2 op 1):
  *
  *  - parser unit semantics (reference `datasets_info/utils/brat.py:25-38`
  *    and the `multicardioner_track1.py:31` variant);
  *  - dataset statistics over all five shipped corpora pinned to the
  *    reference semantics' ground truth (`statistics_datasets.py:11-43`,
  *    numbers reproduced by a faithful Python port — see also the DuckDB
  *    oracle for q33, which re-parses the raw files independently);
  *  - gold-BIO tagging on real corpus text differentially pinned against
  *    the REFERENCE's own `Instance.get_bio_annotations` outputs
  *    (fixture `brat_bio_cases.json`, `scripts/gen_brat_bio_fixture.py`);
  *  - token-metric compare on real gold (pred == gold → all tp, P/R = 1).
  */
class BratSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-brat-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("parseAnn honors T-line / #-skip / tab-field rules") {
    val ann = Seq(
      "T1\tFARMACO 10 22\taspirin forte",            // kept
      "T2\tFARMACO 5 9\tnote # inline hash",          // skipped by Exact3 only
      "#1\tAnnotatorNotes T1\tsome note",             // not a T-line
      "R1\tRelArg Arg1:T1 Arg2:T2",                   // not a T-line
      "T3\tFARMACO 1 3 extra\tbad span arity",        // span split != 3 → dropped
      "T4\tFARMACO 7 8\tx\textra-field",              // 4 tab fields: Exact3 drops, GE3 keeps
      "T5\tENFERMEDAD 0 4\tcava").mkString("\n")
    val exact = Brat.parseAnn(ann, Brat.Exact3)
    assert(exact == Seq(
      Brat.GoldEntity("FARMACO", "aspirin forte", 10, 22),
      Brat.GoldEntity("ENFERMEDAD", "cava", 0, 4)))
    val ge3 = Brat.parseAnn(ann, Brat.GE3)
    assert(ge3 == Seq(
      Brat.GoldEntity("FARMACO", "aspirin forte", 10, 22),
      Brat.GoldEntity("FARMACO", "note # inline hash", 5, 9),
      Brat.GoldEntity("FARMACO", "x", 7, 8),
      Brat.GoldEntity("ENFERMEDAD", "cava", 0, 4)))
  }

  test("dataset statistics over the five real corpora match the reference") {
    // ground truth from the reference loader + numpy-population-std
    // semantics (statistics_datasets.py) run over /root/reference/datasets
    val expected = Map(
      "multicardioner_track1" -> (250L, 5753.976, 2407.5799, 31.536, 15.8167),
      "multicardioner_track2_en" -> (250L, 5584.992, 2359.8031, 6.884, 6.7152),
      "multicardioner_track2_es" -> (250L, 5753.976, 2407.5799, 6.872, 6.6849),
      "multicardioner_track2_it" -> (250L, 5986.312, 2514.0841, 7.2, 7.1353),
      "pharmaconer" -> (197L, 2566.7157, 1116.6543, 9.5228, 10.1149))
    val got = Brat.statistics(spark).collect().map { r =>
      r.getAs[String]("dataset") -> ((r.getAs[Long]("n_docs"),
        r.getAs[Double]("avg_text_length"), r.getAs[Double]("std_text_length"),
        r.getAs[Double]("avg_entities"), r.getAs[Double]("std_entities")))
    }.toMap
    assert(got == expected)
  }

  test("empty .ann docs survive the load with null gold (track2_en keeps all 250)") {
    val df = Brat.load(spark, s"${Brat.ReferenceRoot}/multicardioner-track2/en/brat")
    assert(df.count() == 250)
    assert(df.filter("gold IS NULL").count() == 31) // the 31 empty .ann files
  }

  private lazy val bioCases: Seq[JsonNode] = {
    val in = getClass.getResourceAsStream("/brat_bio_cases.json")
    assert(in != null, "brat_bio_cases.json missing from test resources")
    new ObjectMapper().readTree(in).elements().asScala.toSeq
  }

  test("gold BIO on real corpus text matches the reference implementation") {
    assert(bioCases.size == 30)
    bioCases.foreach { c =>
      val text = c.get("text").asText
      val ents = c.get("entities").elements().asScala.map { e =>
        Mention(e.get("category").asText, e.get("surface").asText,
          e.get("begin").asInt, e.get("end").asInt)
      }.toSeq
      val expected = c.get("bio").elements().asScala.map(_.asText).toSeq
      assert(Tokenize.bioTags(text, ents).toSeq == expected,
        s"${c.get("dataset").asText}/${c.get("doc_id").asText}")
    }
  }

  test("token-metric compare on real gold: pred == gold gives P/R/F1 = 1") {
    bioCases.take(5).foreach { c =>
      val text = c.get("text").asText
      val ents = c.get("entities").elements().asScala.map { e =>
        Mention(e.get("category").asText, e.get("surface").asText,
          e.get("begin").asInt, e.get("end").asInt)
      }.toSeq
      val bio = Tokenize.bioTags(text, ents).toSeq
      val m = graft.eval.BioEval.computeInstanceMetrics(bio, bio)
      assert(m.fp == 0.0 && m.fn == 0.0 && m.tp > 0)
    }
  }

  test("TSV gold reader row count and span-slice invariant") {
    val tsv = Brat.loadTsv(spark,
      s"${Brat.ReferenceRoot}/multicardioner-track2/en/tsv/" +
        "multicardioner_track2_cardioccc_test_en.tsv")
    assert(tsv.count() == 1721) // 1,721 FARMACO gold mentions (SURVEY §6)
    // spans index into the matching BRAT doc text: text.slice(start, end) == text
    val docs = Brat.load(spark, s"${Brat.ReferenceRoot}/multicardioner-track2/en/brat")
      .select("doc_id", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    tsv.collect().take(200).foreach { r =>
      val doc = docs(r.getAs[String]("filename"))
      val (b, e) = (r.getAs[Int]("start_span"), r.getAs[Int]("end_span"))
      assert(doc.substring(b, e) == r.getAs[String]("text"),
        s"${r.getAs[String]("filename")} [$b,$e)")
    }
  }
}
