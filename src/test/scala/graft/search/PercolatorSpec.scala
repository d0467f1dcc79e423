package graft.search

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.io.Catalog

class PercolatorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  private val sfDir = "/root/testdata/sf0.001"

  test("percolate equals per-doc recomputation over the stored queries") {
    import spark.implicits._
    val stored = Percolator.DriverQueries
    val got = Percolator.percolateTable(spark, sfDir, stored)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val docs = Catalog.readTable(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val want = (for {
      (d, text) <- docs.iterator
      toks = graft.core.Analyzer.tokenize(text).toSet
      q <- stored
      if q.terms.count(toks.contains) >= q.minMatch
    } yield (d, q.query_id)).toSet
    assert(got == want)
    assert(!got.exists(_._2 == 3L), "the zebra query must never match")
  }

  test("streaming percolation matches the batch result") {
    import spark.implicits._
    val base = s"/tmp/graft-percolate-${System.nanoTime()}"
    val inDir = s"$base/in"
    new java.io.File(inDir).mkdirs()
    val docs = Catalog.readTable(spark, sfDir, "documents")
      .select($"doc_id", $"text")
    docs.coalesce(1).write.mode(SaveMode.Overwrite).parquet(inDir)

    val stream = Percolator.percolateStream(spark, inDir, docs.schema,
      Percolator.DriverQueries)
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName(s"perc_${System.nanoTime()}").start()
    q.processAllAvailable()
    val got = spark.sql(s"SELECT doc_id, query_id FROM ${q.name}")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    val want = Percolator.percolateTable(spark, sfDir, Percolator.DriverQueries)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }
}
