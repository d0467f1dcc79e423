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

  test("lm_perplexity (bigram LM) matches a local recomputation for every doc, " +
      "identically through the broadcast AND shuffled-join paths") {
    val docs = Catalog.readTable(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> Analyzer.tokenize(r.getString(1)))
    val cf = docs.flatMap(_._2).groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val total = cf.values.sum
    val v = cf.size
    val big = docs.flatMap(_._2.sliding(2).filter(_.length == 2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    val want = docs.filter(_._2.nonEmpty).map { case (id, toks) =>
      val lps = toks.indices.map { i =>
        if (i == 0) math.log((cf(toks(0)) + 1.0) / (total + v))
        else math.log((big.getOrElse((toks(i - 1), toks(i)), 0L) + 1.0) /
          (cf(toks(i - 1)) + v))
      }
      id -> BigDecimal(math.exp(-lps.sum / lps.length))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap

    // gate spec (the Deletes.purge pattern): run once with the vocabulary
    // under the gate (broadcast path) and once with the gate forced to 0
    // (shuffled-join path) — bit-identical rounded output both ways
    def run(): Array[(Long, Long, Double)] = TextAnalysis.lmPerplexity(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val gotBroadcast = run()
    spark.conf.set("spark.graft.lm.broadcastMax", "0")
    val gotShuffled =
      try run() finally spark.conf.unset("spark.graft.lm.broadcastMax")
    assert(gotBroadcast.toSeq == gotShuffled.toSeq,
      "broadcast and shuffled LM joins must agree")

    assert(gotBroadcast.length == want.size)
    gotBroadcast.foreach { case (id, n, ppl) =>
      assert(n == docs.find(_._1 == id).get._2.length)
      assert(math.abs(ppl - want(id)) <= 1e-4, s"doc $id: $ppl vs ${want(id)}")
    }
    // perplexity is a geometric mean of 1/p: > 1 always, bounded by the
    // worst smoothed event's 1/p = max unigram cf + |V|
    assert(gotBroadcast.forall { case (_, _, p) =>
      p > 1.0 && p <= cf.values.max + v + 1.0 })
  }

  test("artifact-reading perplexity equals the inline-count path row for row") {
    val idx = graft.IndexCache.bigramIndex(spark, sfDir)
    val inline = TextAnalysis.lmPerplexity(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val indexed = TextAnalysis.lmPerplexityIndexed(spark, idx.paths.root, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(indexed == inline,
      "dictionary/bigram artifacts must hold the exact inline counts")
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
