package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Catalog
import graft.search.{Booleans, BruteForce, SearchEngine}

/** 3-way oracle chain over the real `documents` corpus (SURVEY.md §5.1):
  * engine (index) ≡ brute-force DF twin here; the DuckDB leg is exercised by
  * the driver via Verify + oracle_sql.json.
  */
class EndToEndSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  lazy val sfDir = "/root/testdata/sf0.001"
  lazy val idx = IndexCache.documentsIndex(spark, sfDir)

  private val refQueries: Seq[Seq[String]] = Seq(
    Seq("join"),
    Seq("window", "stream"),
    Seq("join", "window", "vector"),
    Seq("the", "a"),
    Seq("zebra"),
    Seq("join", "zebra"))

  private def hits(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("engine rank- and score-identical to brute force on the reference set") {
    val docs = Catalog.readDocuments(spark, sfDir).toDF()
    refQueries.foreach { q =>
      val engine = hits(SearchEngine.topKExhaustive(spark, idx.paths.root, q, 10))
      val brute = hits(BruteForce.topK(docs, q, 10))
      assert(engine.map(_._1) == brute.map(_._1), s"rank mismatch for $q")
      engine.zip(brute).foreach { case ((_, se), (_, sb)) =>
        assert(math.abs(se - sb) <= 1e-9 * math.max(1.0, math.abs(sb)),
          s"score mismatch for $q: $se vs $sb")
      }
      if (q != Seq("zebra")) assert(engine.nonEmpty, s"unexpected empty result for $q")
    }
  }

  test("empty-result query returns empty with correct schema") {
    val df = SearchEngine.topKExhaustive(spark, idx.paths.root, Seq("zebra"), 10)
    assert(df.columns.toSeq == Seq("doc_id", "score"))
    assert(df.count() == 0)
  }

  test("boolean AND/NOT match token-derived sets") {
    import spark.implicits._
    val docs = Catalog.readDocuments(spark, sfDir)
    def docsWith(t: String): Set[Long] =
      docs.collect().filter(d => graft.core.Analyzer.tokenize(d.text).contains(t))
        .map(_.doc_id).toSet
    val andGot = Booleans.and(spark, idx.paths.root, Seq("join", "hash"))
      .as[Long].collect().toSeq
    val andExp = (docsWith("join") intersect docsWith("hash")).toSeq.sorted
    assert(andGot == andExp)
    val notGot = Booleans.andNot(spark, idx.paths.root, "join", "window")
      .as[Long].collect().toSeq
    val notExp = (docsWith("join") -- docsWith("window")).toSeq.sorted
    assert(notGot == notExp)
  }

  test("dictionary df/cf match recount; corpus stats exact") {
    import spark.implicits._
    val docs = Catalog.readDocuments(spark, sfDir).collect()
    val dict = Catalog.readDictionary(spark, idx.paths).collect()
      .map(d => d.term -> (d.df, d.cf)).toMap
    val byTerm = docs.flatMap(d => graft.core.Analyzer.tokenize(d.text).map(t => (t, d.doc_id)))
    val exp = byTerm.groupBy(_._1).map { case (t, xs) =>
      t -> (xs.map(_._2).distinct.length.toLong, xs.length.toLong)
    }
    assert(dict == exp)
    val stats = Catalog.readCorpusStats(spark, idx.paths)
    val dls = docs.map(d => graft.core.Analyzer.tokenize(d.text).length)
    assert(stats.n_docs == docs.length)
    assert(stats.total_tokens == dls.map(_.toLong).sum)
    assert(math.abs(stats.avgdl - dls.sum.toDouble / docs.length) < 1e-12)
  }

  test("salting engaged at sandbox targetRun and runs stay disjoint per term") {
    import spark.implicits._
    val blocks = Catalog.readPostings(spark, idx.paths).collect()
    // head terms at sf0.001 have df > 256 → fanout ≥ 2
    assert(blocks.exists(_.run_id > 0), "expected at least one salted run")
    blocks.groupBy(_.term).foreach { case (t, bs) =>
      val runs = bs.groupBy(_.run_id).toSeq.sortBy(_._1)
        .map { case (r, rbs) => (r, rbs.map(_.first_doc).min, rbs.map(_.last_doc).max) }
      runs.sliding(2).foreach {
        case Seq((r1, _, hi1), (r2, lo2, _)) =>
          assert(hi1 < lo2, s"term $t: run $r1 [..$hi1] overlaps run $r2 [$lo2..]")
        case _ =>
      }
    }
  }

  test("dense_ids equals row_number oracle") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val docs = Catalog.readTable(spark, sfDir, "documents").select("doc_id", "source")
    val got = index.DocIds.denseIds(docs, Seq("source", "doc_id"), 4)
      .select("rid", "doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    val exp = docs
      .withColumn("rid", row_number().over(Window.orderBy("source", "doc_id")) - 1)
      .select("rid", "doc_id").collect().map(r => ((r.getInt(0) - 0).toLong, r.getLong(1))).toSeq.sortBy(_._1)
    assert(got == exp)
  }

  test("determinism across parallelism: same hits at local[1] shuffle=1") {
    // same session, but repartitioned differently: rebuild at 1 partition
    val idx1 = graft.index.Indexer.buildFromDocs(
      Catalog.readDocuments(spark, sfDir),
      s"/tmp/graft-test-idx1-${System.nanoTime()}",
      buckets = 4, targetRun = 256, numPartitionsOpt = Some(1))
    val q = Seq("join", "window", "vector")
    val a = hits(SearchEngine.topKExhaustive(spark, idx.paths.root, q, 10))
    val b = hits(SearchEngine.topKExhaustive(spark, idx1.paths.root, q, 10))
    assert(a == b, "parallelism changed the result bit-for-bit")
  }
}
