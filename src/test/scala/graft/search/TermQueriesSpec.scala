package graft.search

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.{IndexCache, TestSpark}
import graft.io.Catalog

/** ES prefix/fuzzy analogs: expansion semantics and empty-result edges. */
class TermQueriesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val idx = IndexCache.documentsIndex(spark, sfDir)

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.collect().map(_.getLong(0)).toSeq

  test("fuzzy equals the disjunction of its levenshtein expansion") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val expanded = Catalog.readDictionary(spark, idx.paths).toDF()
      .filter(levenshtein($"term", lit("joln")) <= 1)
      .collect().map(_.getString(0)).toSeq.sorted
    assert(expanded.nonEmpty, "fixture must expand to at least one vocab term")
    assert(ids(TermQueries.fuzzy(spark, idx.paths.root, "joln")) ==
      ids(Booleans.or(spark, idx.paths.root, expanded)))
  }

  test("fuzzy with no expansion and prefix with no match return empty doc_id sets") {
    val f = TermQueries.fuzzy(spark, idx.paths.root, "zzzzzzzzzz")
    assert(f.columns.toSeq == Seq("doc_id") && f.count() == 0)
    val p = TermQueries.prefix(spark, idx.paths.root, "zzz")
    assert(p.columns.toSeq == Seq("doc_id") && p.count() == 0)
  }

  test("prefix equals the union of matching terms' doc sets") {
    import spark.implicits._
    val matching = Catalog.readDictionary(spark, idx.paths).toDF()
      .filter($"term".startsWith("s")).collect().map(_.getString(0)).toSeq
    assert(matching.nonEmpty)
    assert(ids(TermQueries.prefix(spark, idx.paths.root, "s")) ==
      ids(Booleans.or(spark, idx.paths.root, matching)))
  }
}
