package graft.index

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.{Fixtures, TestSpark}
import graft.io.Catalog
import graft.io.Catalog.IndexPaths
import graft.search.SearchEngine

/** Resume semantics (SURVEY.md §5.2 Resume): completed stages are skipped on
  * --resume; a changed upstream snapshot cascades re-runs; a resumed build's
  * index is content-identical to a cold build.
  */
class ResumeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  private def writeTurnsFixture(path: String): Unit = {
    import spark.implicits._
    Fixtures.sfUnit.toDS().write.mode(SaveMode.Overwrite).parquet(path)
  }

  private def build(input: String, out: String, resume: Boolean): IndexBuildJob.Summary =
    IndexBuildJob.run(spark, IndexBuildJob.Args(
      input = input, output = out, buckets = 4, targetRun = 128,
      partitions = Some(4), resume = resume))

  private def postingsContent(root: String): Seq[(String, Int, Int, Long, Long, Seq[Long])] =
    Catalog.readPostings(spark, IndexPaths(root)).collect().toSeq
      .map(b => (b.term, b.run_id, b.block_idx, b.first_doc, b.last_doc,
        graft.core.Blocks.decode(b).docs.toSeq))
      .sortBy(x => (x._1, x._2, x._3))

  test("cold build runs all stages; resume skips all; index queryable") {
    val dir = s"/tmp/graft-resume-${System.nanoTime()}"
    writeTurnsFixture(s"$dir/turns")
    val s1 = build(s"$dir/turns", s"$dir/idx", resume = false)
    assert(s1.stagesRun == Seq("docid_assign", "spimi", "finalize"))
    assert(s1.nTurns == 500 && s1.turnsPerSec > 0)

    val s2 = build(s"$dir/turns", s"$dir/idx", resume = true)
    assert(s2.stagesRun.isEmpty)
    assert(s2.stagesSkipped == Seq("docid_assign", "spimi", "finalize"))

    val hits = SearchEngine.topKWand(spark, s"$dir/idx", Seq(Fixtures.term(0)), 5)
    assert(hits.count() == 5)
  }

  test("resumed rebuild of dropped later stages is content-identical to cold build") {
    val dir = s"/tmp/graft-resume2-${System.nanoTime()}"
    writeTurnsFixture(s"$dir/turns")
    build(s"$dir/turns", s"$dir/idx", resume = false)
    val cold = postingsContent(s"$dir/idx")
    val coldDict = Catalog.readDictionary(spark, IndexPaths(s"$dir/idx"))
      .collect().sortBy(_.term).toSeq

    // drop spimi+finalize outputs and their manifests, keep docid_assign
    import scala.reflect.io.Directory
    new Directory(new java.io.File(s"$dir/idx/postings")).deleteRecursively()
    new Directory(new java.io.File(s"$dir/idx/dictionary")).deleteRecursively()
    // manifests: rewrite without spimi/finalize rows
    import spark.implicits._
    val kept = spark.read.parquet(s"$dir/idx/manifests").as[graft.model.ManifestEntry]
      .filter(m => m.stage != "spimi" && m.stage != "finalize").collect().toSeq
    kept.toDS().write.mode(SaveMode.Overwrite).parquet(s"$dir/idx/manifests_new")
    new Directory(new java.io.File(s"$dir/idx/manifests")).deleteRecursively()
    new java.io.File(s"$dir/idx/manifests_new").renameTo(new java.io.File(s"$dir/idx/manifests"))

    val s = build(s"$dir/turns", s"$dir/idx", resume = true)
    assert(s.stagesSkipped == Seq("docid_assign"))
    assert(s.stagesRun == Seq("spimi", "finalize"))

    assert(postingsContent(s"$dir/idx") == cold, "resumed postings differ from cold build")
    val dict = Catalog.readDictionary(spark, IndexPaths(s"$dir/idx"))
      .collect().sortBy(_.term).toSeq
    assert(dict == coldDict)
  }

  test("--compact batch build: one run per term, identical query results") {
    val dir = s"/tmp/graft-resume5-${System.nanoTime()}"
    writeTurnsFixture(s"$dir/turns")
    build(s"$dir/turns", s"$dir/plain", resume = false)
    val s = IndexBuildJob.run(spark, IndexBuildJob.Args(
      input = s"$dir/turns", output = s"$dir/compacted", buckets = 4,
      targetRun = 128, partitions = Some(4), compact = true))
    assert(s.stagesRun.last == "compact")

    val runs = Catalog.readPostings(spark, IndexPaths(s"$dir/compacted"))
      .collect().map(_.run_id).distinct.toSeq
    assert(runs == Seq(0), "compaction must collapse every term to one run")

    def hits(root: String, terms: Seq[String]) =
      SearchEngine.topKWand(spark, root, terms, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    for (terms <- Seq(Seq(Fixtures.term(0)), Seq(Fixtures.term(3), Fixtures.term(950))))
      assert(hits(s"$dir/compacted", terms) == hits(s"$dir/plain", terms))
  }

  test("pre-round-4 index (no grid_bounds) resumes: spimi synthesizes geometry") {
    val dir = s"/tmp/graft-resume6-${System.nanoTime()}"
    writeTurnsFixture(s"$dir/turns")
    build(s"$dir/turns", s"$dir/idx", resume = false)
    import scala.reflect.io.Directory
    // simulate a legacy index: drop grid_bounds with the later stages
    for (d <- Seq("grid_bounds", "postings", "dictionary"))
      new Directory(new java.io.File(s"$dir/idx/$d")).deleteRecursively()
    import spark.implicits._
    val kept = spark.read.parquet(s"$dir/idx/manifests").as[graft.model.ManifestEntry]
      .filter(m => m.stage != "spimi" && m.stage != "finalize").collect().toSeq
    kept.toDS().write.mode(SaveMode.Overwrite).parquet(s"$dir/idx/manifests_new")
    new Directory(new java.io.File(s"$dir/idx/manifests")).deleteRecursively()
    new java.io.File(s"$dir/idx/manifests_new").renameTo(new java.io.File(s"$dir/idx/manifests"))

    val sum = build(s"$dir/turns", s"$dir/idx", resume = true)
    assert(sum.stagesSkipped == Seq("docid_assign"))
    assert(sum.stagesRun == Seq("spimi", "finalize"))
    val hits = SearchEngine.topKWand(spark, s"$dir/idx", Seq(Fixtures.term(0)), 5)
    assert(hits.count() == 5, "legacy resume must produce a queryable index")
  }

  test("changed input fingerprint cascades a full re-run") {
    val dir = s"/tmp/graft-resume3-${System.nanoTime()}"
    writeTurnsFixture(s"$dir/turns")
    build(s"$dir/turns", s"$dir/idx", resume = false)
    // touch the input (rewrite => new file listing/mtime => new fingerprint)
    writeTurnsFixture(s"$dir/turns")
    val s = build(s"$dir/turns", s"$dir/idx", resume = true)
    assert(s.stagesRun.contains("docid_assign"), "input change must re-run S1")
    assert(s.stagesRun == Seq("docid_assign", "spimi", "finalize"))
  }

  test("--bigrams builds the LM artifact; resume skips it; counts exact") {
    import spark.implicits._
    val dir = s"/tmp/graft-resume-big-${System.nanoTime()}"
    writeTurnsFixture(s"$dir/turns")
    val s1 = IndexBuildJob.run(spark, IndexBuildJob.Args(
      input = s"$dir/turns", output = s"$dir/idx", buckets = 4, targetRun = 128,
      partitions = Some(4), resume = false, bigrams = true))
    assert(s1.stagesRun == Seq("docid_assign", "spimi", "finalize", "bigram_lm"))
    val paths = IndexPaths(s"$dir/idx")
    assert(graft.io.Fs.exists(paths.bigrams))

    val art = spark.read.parquet(paths.bigrams)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    // exact: recount adjacent analyzed-token pairs from the corpus locally
    val want = Catalog.readNumbered(spark, paths).collect()
      .flatMap(t => graft.core.Analyzer.tokenize(t.text).sliding(2)
        .filter(_.length == 2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    assert(art == want)

    val s2 = IndexBuildJob.run(spark, IndexBuildJob.Args(
      input = s"$dir/turns", output = s"$dir/idx", buckets = 4, targetRun = 128,
      partitions = Some(4), resume = true, bigrams = true))
    assert(s2.stagesRun.isEmpty)
    assert(s2.stagesSkipped ==
      Seq("docid_assign", "spimi", "finalize", "bigram_lm"))
    val again = spark.read.parquet(paths.bigrams)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(again == art, "resume must leave the artifact byte-identical")
  }

  test("manifests carry per-partition lineage rows") {
    import spark.implicits._
    val dir = s"/tmp/graft-resume4-${System.nanoTime()}"
    writeTurnsFixture(s"$dir/turns")
    build(s"$dir/turns", s"$dir/idx", resume = false)
    val m = spark.read.parquet(s"$dir/idx/manifests").as[graft.model.ManifestEntry].collect()
    assert(m.exists(e => e.stage == "docid_assign" && e.partition_id == -1 && e.status == "complete"))
    val perPart = m.filter(e => e.stage == "docid_assign" && e.partition_id >= 0)
    assert(perPart.nonEmpty && perPart.map(_.rows).sum == 500)
    assert(perPart.forall(_.bytes > 0))
    // metrics present
    val metrics = spark.read.parquet(s"$dir/idx/metrics").as[graft.model.MetricRow].collect()
    assert(metrics.exists(r => r.stage == "total" && r.key == "turns_per_sec" && r.value > 0))
  }
}
