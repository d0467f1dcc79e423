package graft.search

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.{IndexCache, TestSpark}
import graft.index.Indexer
import graft.io.Catalog

/** English-analyzed index: the IndexMeta analyzer pin means query-time
  * analysis always equals index-time analysis, and the WAND path over the
  * stemmed index is bit-identical to an index-free analyzed brute-force twin.
  */
class EnglishIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  lazy val sfDir = "/root/testdata/sf0.001"

  private def hits(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] = {
    import spark.implicits._
    df.select($"doc_id", $"score_r4").as[(Long, Double)].collect().toSeq
  }

  test("english index records its analyzer; WAND equals the analyzed brute twin") {
    val idx = IndexCache.englishIndex(spark, sfDir)
    assert(idx.meta.analyzer == "english")
    val docs = Catalog.readDocuments(spark, sfDir).toDF()
    for (q <- Seq(Seq("joins", "windows"), Seq("vector", "merging"),
        Seq("the", "join"), Seq("running"))) {
      val wand = hits(SearchEngine.topKWandRounded(spark, idx.paths.root, q, 10))
      val brute = hits(BruteForce.topKAnalyzed(docs, q, 10, "english")
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.round(
            org.apache.spark.sql.functions.col("score"), 4).as("score_r4")))
      assert(wand == brute, s"query $q: WAND vs analyzed brute mismatch")
    }
  }

  test("surface forms conflate: inflected query equals stemmed query") {
    val idx = IndexCache.englishIndex(spark, sfDir)
    val a = hits(SearchEngine.topKWandRounded(spark, idx.paths.root, Seq("joins"), 10))
    val b = hits(SearchEngine.topKWandRounded(spark, idx.paths.root, Seq("join"), 10))
    assert(a == b, "'joins' and 'join' must hit the same stemmed postings")
    assert(a.nonEmpty, "'join' must match documents in the fixture corpus")
  }

  test("stopwords carry no postings and queries drop them") {
    import spark.implicits._
    val idx = IndexCache.englishIndex(spark, sfDir)
    val dictTerms = Catalog
      .readDictionary(spark, graft.io.Catalog.IndexPaths(idx.paths.root))
      .select($"term").as[String].collect().toSet
    assert(graft.core.En.Stopwords.intersect(dictTerms).isEmpty,
      "no stopword may appear in the english dictionary")
    // a pure-stopword query is empty, not an error
    assert(SearchEngine.topKWandRounded(spark, idx.paths.root, Seq("the", "and"), 10)
      .count() == 0L)
    // dl excludes stopwords: english avgdl strictly below standard avgdl
    val std = IndexCache.documentsIndex(spark, sfDir)
    assert(idx.stats.avgdl < std.stats.avgdl)
    assert(idx.stats.n_docs == std.stats.n_docs, "N counts all docs either way")
  }

  test("conflation changes ranking semantics on an inflection-split corpus") {
    import spark.implicits._
    val tag = java.util.UUID.randomUUID().toString.take(8)
    val root = s"/tmp/graft-en-inline-$tag"
    val docs = Seq(
      graft.model.Doc(0L, "running shoes for the marathon"),
      graft.model.Doc(1L, "he runs daily"),
      graft.model.Doc(2L, "a long run in the park"),
      graft.model.Doc(3L, "completely unrelated text about databases")).toDS()
    try {
      Indexer.buildFromDocs(docs, root, buckets = 4, targetRun = 16,
        analyzer = "english")
      val got = SearchEngine.topKWandRounded(spark, root, Seq("run"), 10)
        .select($"doc_id").as[Long].collect().toSet
      assert(got == Set(0L, 1L, 2L),
        "stemming must conflate running/runs/run into one posting list")
    } finally graft.io.Fs.delete(root)
  }
}
