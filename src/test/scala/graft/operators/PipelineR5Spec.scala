package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Analyzer
import graft.io.Catalog

/** Round-5 pipeline additions: unigram-LM perplexity, domain mixing,
  * redaction, filtered kNN.
  */
class PipelineR5Spec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  private val sfDir = "/root/testdata/sf0.001"

  test("lm_perplexity matches a local recomputation for every doc") {
    val docs = Catalog.readTable(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> Analyzer.tokenize(r.getString(1)))
    val cf = docs.flatMap(_._2).groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val total = cf.values.sum
    val v = cf.size
    val want = docs.map { case (id, toks) =>
      val lps = toks.map(t => math.log((cf(t) + 1.0) / (total + v)))
      id -> BigDecimal(math.exp(-lps.sum / lps.length))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val got = TextAnalysis.lmPerplexity(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == docs.length)
    got.foreach { case (id, n, ppl) =>
      assert(n == docs.find(_._1 == id).get._2.length)
      assert(math.abs(ppl - want(id)) <= 1e-4, s"doc $id: $ppl vs ${want(id)}")
    }
    // perplexity is a geometric mean of 1/p: > 1 always, bounded by the
    // rarest token's 1/p = (total+|V|)/2
    assert(got.forall { case (_, _, p) => p > 1.0 && p <= (total + v) / 2.0 })
  }

  test("ppl_buckets: terciles are balanced and monotone in perplexity") {
    val rows = TextAnalysis.pplBuckets(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    val n = rows.length
    assert(n > 0)
    val byBucket = rows.groupBy(_._3).map { case (b, xs) => b -> xs.length }
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    // terciles: each bucket near n/3 (ties can shift the thirds a little)
    byBucket.values.foreach(c =>
      assert(c >= n / 3 - n / 10 && c <= n / 3 + n / 10, byBucket))
    // monotone: max ppl in head <= min in middle <= ... (weak: <= via sort)
    def range(b: String) = {
      val v = rows.filter(_._3 == b).map(_._2)
      (v.min, v.max)
    }
    assert(range("head")._2 <= range("middle")._1)
    assert(range("middle")._2 <= range("tail")._1)
  }

  test("domain_mix: argmin domain kept whole, others down-sampled to target ratio") {
    import spark.implicits._
    val targets = Map("src1" -> 0.5, "src2" -> 0.3, "src3" -> 0.2)
    val got = Hygiene.domainMix(spark, sfDir, targets)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.nonEmpty)
    assert(got.map(_._2).toSet.subsetOf(targets.keySet))
    val counts = Catalog.readTable(spark, sfDir, "documents")
      .groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // scale = min(c/w); the domain attaining it has rate exactly 1.0
    val scale = targets.map { case (s, w) => counts(s) / w }.min
    val argmin = targets.minBy { case (s, w) => counts(s) / w }._1
    val kept = got.groupBy(_._2).map { case (s, xs) => s -> xs.length }
    assert(kept(argmin) == counts(argmin).toInt)
    // every kept count is at most its domain total and the hash threshold
    // is deterministic: a second run returns the identical set
    val again = Hygiene.domainMix(spark, sfDir, targets)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == again.toSeq)
    targets.keys.foreach(s => assert(kept.getOrElse(s, 0) <= counts(s)))
    assert(scale > 0)
  }

  test("redact_patterns: no digit survives; counts match the source rows") {
    val got = Hygiene.redactEvents(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.nonEmpty)
    got.foreach { case (_, redacted, n) =>
      assert(!redacted.exists(_.isDigit), redacted)
      assert(n >= 1) // every props payload carries a numeric literal
      assert(redacted.contains("<NUM>"))
    }
    val raw = Catalog.readTable(spark, sfDir, "events")
      .select("event_id", "props").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    got.foreach { case (id, _, n) =>
      assert(n == "[0-9]+".r.findAllIn(raw(id)).length)
    }
  }

  test("knn_filtered equals post-filtering the unfiltered exact ranking") {
    import spark.implicits._
    val k = 10
    val labels = Catalog.readTable(spark, sfDir, "embeddings")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = Embeddings.cosineTopKFiltered(spark, sfDir, 0L, k, labelEq = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.nonEmpty)
    got.foreach { case (id, _) => assert(labels(id) == 3) }
    // pre-filter ≡ post-filter when the unfiltered ranking is exhaustive
    val all = Embeddings.cosineTopK(spark, sfDir, 0L, labels.size)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .filter { case (id, _) => labels(id) == 3 }
      .take(k)
    assert(got.toSeq == all.toSeq)
  }
}
