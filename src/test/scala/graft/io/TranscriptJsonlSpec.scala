package graft.io

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.Indexer
import graft.search.{BruteForce, SearchEngine}

/** Realistic JSONL ingest smoke (FIXTURES.md: tx_survey.jsonl is a real
  * multi-turn agent transcript in the exact payload shape).
  */
class TranscriptJsonlSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  private val path = "/root/.graft/tx_survey.jsonl"

  test("real agent transcript ingests, indexes, and searches end-to-end") {
    assume(new java.io.File(path).exists(), "sample transcript not mounted")
    import spark.implicits._
    val turns = TranscriptJsonl.readTurns(spark, path)
    val collected = turns.collect()
    assert(collected.length == 95, "64 assistant + 31 user messages")
    assert(collected.forall(_.conv_id.nonEmpty))
    assert(collected.map(_.turn_idx).distinct.length == 95)
    assert(collected.exists(_.tool.nonEmpty), "tool-use turns carry a tool name")
    assert(collected.exists(_.text.nonEmpty))

    val root = s"/tmp/graft-jsonl-${System.nanoTime()}"
    val res = Indexer.buildFromTurns(turns, root, buckets = 4, targetRun = 1 << 16)
    assert(res.stats.n_docs == 95)

    // pick a token that actually occurs and verify engine vs brute force
    val term = graft.core.Analyzer.tokenize(
      collected.map(_.text).find(_.nonEmpty).get).head
    val numbered = Catalog.readDocidMap(spark, res.paths).toDF()
      .join(turns.toDF(), Seq("conv_id", "turn_idx"))
      .select($"doc_id", $"text")
    val w = SearchEngine.topKWand(spark, root, Seq(term), 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = BruteForce.topK(numbered, Seq(term), 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(w.map(_._1) == b.map(_._1))
  }
}
