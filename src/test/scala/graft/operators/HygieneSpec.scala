package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Analyzer
import graft.io.Catalog

class HygieneSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  private val sfDir = "/root/testdata/sf0.001"

  test("repetitionStats matches a sequential recompute on every doc") {
    import spark.implicits._
    val got = Hygiene.repetitionStats(spark, sfDir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    val docs = Catalog.readTable(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    assert(got.size == docs.length)
    docs.foreach { case (d, text) =>
      val t = Analyzer.tokenize(text)
      val n = t.length
      val dup = if (n == 0) 0.0 else (n - t.distinct.length).toDouble / n
      val bg = if (n < 2) 0.0
        else t.sliding(2).map(_.toList).toSeq.groupBy(identity).values
          .map(_.length).max.toDouble / (n - 1)
      val (gn, gd, gb) = got(d)
      assert(gn == n.toLong)
      assert(math.abs(gd - BigDecimal(dup).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
      assert(math.abs(gb - BigDecimal(bg).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }

  test("decontaminate: every flagged doc truly shares a trigram with the holdout; no holdout docs flagged") {
    import spark.implicits._
    val got = Hygiene.decontaminate(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    assert(got.nonEmpty)
    assert(got.keySet.forall(_ % 97 != 0))
    def shingles(text: String): Set[Seq[String]] =
      Analyzer.tokenize(text).sliding(3).filter(_.length == 3).map(_.toSeq).toSet
    val docs = Catalog.readTable(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val evalSh = docs.filter(_._1 % 97 == 0).flatMap(d => shingles(d._2)).toSet
    docs.filter(_._1 % 97 != 0).foreach { case (d, text) =>
      val shared = (shingles(text) & evalSh).size.toLong
      assert(got.getOrElse(d, 0L) == shared, s"doc $d shared-shingle count")
    }
  }

  test("splitHash: deterministic, pure function of doc_id, plausible holdout rate") {
    import spark.implicits._
    val a = Hygiene.splitHash(spark, sfDir).as[(Long, String)].collect().toSeq
    val b = Hygiene.splitHash(spark, sfDir).as[(Long, String)].collect().toSeq
    assert(a == b)
    val frac = a.count(_._2 == "holdout").toDouble / a.length
    assert(frac > 0.04 && frac < 0.25, s"holdout fraction $frac implausible for 2/16 nibbles")
    // recompute one assignment by hand
    val md = java.security.MessageDigest.getInstance("MD5")
    a.take(20).foreach { case (d, split) =>
      val hex = md.digest(d.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val want = if (hex.charAt(0) == '0' || hex.charAt(0) == '1') "holdout" else "train"
      assert(split == want)
    }
  }

  test("stratifiedSample: exactly the k hash-smallest docs per stratum, rn dense") {
    import spark.implicits._
    val got = Hygiene.stratifiedSample(spark, sfDir, 3)
      .as[(String, Long, Long)].collect().toSeq
    val byStratum = got.groupBy(_._1)
    val docs = Catalog.readTable(spark, sfDir, "documents")
      .select($"source", $"doc_id").as[(String, Long)].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(d: Long) = md.digest(d.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    docs.groupBy(_._1).foreach { case (src, ds) =>
      val want = ds.map(_._2).sortBy(d => (h(d), d)).take(3)
      val gotDocs = byStratum(src).sortBy(_._2).map(_._3)
      assert(gotDocs == want.toSeq, s"stratum $src picks")
      assert(byStratum(src).map(_._2).sorted == (1L to want.length).toSeq)
    }
  }

  test("stratifiedSample is partitioning-invariant (map-side partials merge correctly)") {
    import spark.implicits._
    val base = Hygiene.stratifiedSample(spark, sfDir, 3).collect().toSeq
    val parts = spark.sessionState.conf.numShufflePartitions
    // same computation over a repartitioned source must agree — exercised
    // through the public API by toggling shuffle width
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try {
      val narrow = Hygiene.stratifiedSample(spark, sfDir, 3).collect().toSeq
      assert(narrow == base)
    } finally spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
  }
}
