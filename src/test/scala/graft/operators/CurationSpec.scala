package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Analyzer
import graft.io.Catalog

class CurationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  private val sfDir = "/root/testdata/sf0.001"

  test("packSequences equals the sequential exclusive-prefix computation") {
    import spark.implicits._
    val budget = 512L
    val got = Curation.packSequences(spark, sfDir, budget)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val seq = Catalog.readTable(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().sortBy(_._1)
    var running = 0L
    val want = seq.map { case (d, text) =>
      val n = Analyzer.tokenize(text).length.toLong
      val pack = running / budget
      running += n
      (d, n, pack)
    }
    assert(got.toSeq == want.toSeq)
    // packs are contiguous and non-decreasing
    assert(got.map(_._3).toSeq == got.map(_._3).toSeq.sorted)
  }

  test("funnel: first failing rule wins, kept docs pass every rule") {
    import spark.implicits._
    val rows = Curation.funnel(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getString(2))).toMap
    val docs = Catalog.readTable(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val canon = docs.groupBy(_._2).map { case (_, g) => g.map(_._1).min }.toSet
    docs.foreach { case (d, text) =>
      val t = Analyzer.tokenize(text)
      val nStop = t.count(x => x == "the" || x == "a")
      val q = math.min(t.length / 100.0, 1.0) * (1.0 - nStop.toDouble / t.length)
      val en = t.distinct.count(Set("the", "a", "of", "and"))
      val es = t.distinct.count(Set("el", "la", "de", "los"))
      val lang = if (en >= es && en > 0) "en" else if (es > 0) "es" else "und"
      val expect =
        if (t.length < 30) "too_short"
        else if (q < 0.45) "low_quality"
        else if (lang != "en") "lang"
        else if (!canon.contains(d)) "exact_dup"
        else "kept"
      assert(rows(d) == (expect == "kept", expect), s"doc $d")
    }
  }
}
