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

  test("prefix/fuzzy postings scans are bucket-pruned with term pushdown") {
    // dictionary expansion determines the exact hash buckets, so the scan
    // must show bucket partition pruning + a pushed term IN filter — not a
    // full-bucket sweep relying on row-group stats (VERDICT r2 item 7)
    for (df <- Seq(TermQueries.prefix(spark, idx.paths.root, "s"),
        TermQueries.fuzzy(spark, idx.paths.root, "joln"))) {
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("PushedFilters") && p.contains("term"),
        s"expected term pushdown in:\n${p.take(2000)}")
      assert(p.contains("PartitionFilters") || p.contains("bucket#"),
        s"expected bucket partition pruning in:\n${p.take(2000)}")
    }
  }

  test("prefix expansion cap is term-ordered") {
    import spark.implicits._
    val all = Catalog.readDictionary(spark, idx.paths).toDF()
      .filter($"term".startsWith("s")).orderBy($"term")
      .collect().map(_.getString(0)).toSeq
    assert(all.size >= 2, "fixture needs >= 2 s-terms")
    val capped = TermQueries.prefix(spark, idx.paths.root, "s", maxExpansions = 1)
    assert(ids(capped) == ids(Booleans.or(spark, idx.paths.root, Seq(all.head))))
  }

  test("_termvectors matches a local tokenize of the doc + dictionary stats") {
    import spark.implicits._
    val docId = 7L
    val got = TermQueries.termVectors(spark, idx.paths.root, sfDir, docId)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val text = Catalog.readTable(spark, sfDir, "documents")
      .filter($"doc_id" === docId).select($"text").head().getString(0)
    val tf = graft.core.Analyzer.tokenize(text).groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    val dict = Catalog.readDictionary(spark, idx.paths)
      .collect().map(e => e.term -> (e.df, e.cf)).toMap
    val want = tf.toSeq.sortBy(_._1).map { case (t, f) =>
      (t, f, dict(t)._1, dict(t)._2)
    }
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("_count equals the conjunction's cardinality") {
    val n = TermQueries.countMatching(spark, idx.paths.root, Seq("join", "hash"))
      .head().getLong(0)
    assert(n == Booleans.and(spark, idx.paths.root, Seq("join", "hash")).count())
    assert(n > 0)
  }
}
