package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.io.Catalog

/** DSIR importance weights against a local closed-form recomputation. */
class DsirSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  test("importance weights equal the local hashed-ngram model") {
    import spark.implicits._
    val docs = Catalog.readTable(spark, dir, "documents")
      .select($"doc_id", $"source", $"text")
      .as[(Long, String, String)].collect()
    val nB = 64
    def ngrams(text: String): Seq[String] = {
      val t = graft.core.Analyzer.tokenize(text).toSeq
      t ++ t.sliding(2).filter(_.size == 2).map(p => s"${p(0)}_${p(1)}")
    }
    def bucket(ng: String): Int =
      Integer.parseInt(md5hex(ng).substring(0, 2), 16) % nB

    val feats = docs.flatMap { case (id, src, text) =>
      ngrams(text).map(ng => (id, src == "src1", bucket(ng)))
    }
    val rc = feats.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val tc = feats.filter(_._2).groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val rT = rc.values.sum.toDouble
    val tT = tc.values.sum.toDouble
    val lr = rc.keys.map { b =>
      b -> (math.log((tc.getOrElse(b, 0L) + 1.0) / (tT + nB)) -
        math.log((rc(b) + 1.0) / (rT + nB)))
    }.toMap
    val want = feats.groupBy(_._1).view
      .mapValues(_.map(f => lr(f._3)).sum).toSeq
      .sortBy { case (id, w) => (-w, id) }.take(50)
      .map { case (id, w) => (id, math.rint(w * 1e6) / 1e6) }

    val got = Dsir.importanceWeights(spark, dir, "src1", 50)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.map(_._1) == want.map(_._1))
    got.zip(want).foreach { case ((_, g), (_, w)) =>
      assert(math.abs(g - w) < 2e-6, "6dp with summation-order slack")
    }
  }

  test("target-domain docs dominate the selection (the operator selects)") {
    import spark.implicits._
    val top = Dsir.importanceWeights(spark, dir, "src1", 50)
    val srcOf = Catalog.readTable(spark, dir, "documents")
      .select($"doc_id", $"source").as[(Long, String)].collect().toMap
    val hits = top.collect().map(r => srcOf(r.getLong(0)))
    val frac = hits.count(_ == "src1").toDouble / hits.length
    val base = srcOf.values.count(_ == "src1").toDouble / srcOf.size
    assert(frac > base, s"selection should enrich src1: $frac vs base $base")
  }
}
