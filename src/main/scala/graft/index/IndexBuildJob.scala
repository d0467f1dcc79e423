package graft.index

import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Catalog
import graft.io.Catalog.IndexPaths
import graft.model._

/** Staged, resumable index build (SURVEY.md §3.1) — spark-submit entry #1.
  *
  * {{{
  * spark-submit --class graft.index.IndexBuildJob <jar> \
  *   --input <turns table path> [--format parquet|jsonl] \
  *   --output <index root> [--buckets 16] [--target-run 1048576] \
  *   [--partitions P] [--resume]
  * }}}
  *
  * Checkpoint = materialization: every stage writes a table; Spark lineage is
  * never replayed across stages, so a 10^12-turn build resumes at stage
  * granularity. Stage inputs are fingerprinted (snapshot id / file-listing
  * hash); a stage re-runs iff its input snapshot changed or its manifest is
  * missing — so corrupting/altering any upstream output cascades re-runs
  * downstream, and an untouched prefix is skipped byte-for-byte.
  *
  * Stages and their exchanges (4 shuffles total — the scaling story):
  *   S1 docid_assign  range-exchange on (conv_id, turn_idx) → corpus_sorted,
  *                    docid_map
  *   S2 stats         narrow tokenize+TF; groupBy(term) agg (partial agg
  *                    absorbs head-term skew) → term_freqs, doc_lengths,
  *                    corpus_stats, term_stats
  *   S3 spimi         salted repartition(term, salt) — the skew-critical
  *                    exchange, bounded by SaltPlan → postings (bucketed)
  *   S4 finalize      metadata-only groupBy over postings (payloads pruned)
  *                    → dictionary, meta
  */
object IndexBuildJob {

  final case class Args(
      input: String = "",
      format: String = "parquet",
      output: String = "",
      buckets: Int = 16,
      targetRun: Long = 1L << 20,
      partitions: Option[Int] = None,
      resume: Boolean = false)

  def parse(argv: Array[String]): Args = {
    var a = Args()
    var i = 0
    while (i < argv.length) {
      argv(i) match {
        case "--input" => a = a.copy(input = argv(i + 1)); i += 2
        case "--format" => a = a.copy(format = argv(i + 1)); i += 2
        case "--output" => a = a.copy(output = argv(i + 1)); i += 2
        case "--buckets" => a = a.copy(buckets = argv(i + 1).toInt); i += 2
        case "--target-run" => a = a.copy(targetRun = argv(i + 1).toLong); i += 2
        case "--partitions" => a = a.copy(partitions = Some(argv(i + 1).toInt)); i += 2
        case "--resume" => a = a.copy(resume = true); i += 1
        case other => throw new IllegalArgumentException(s"unknown arg: $other")
      }
    }
    require(a.input.nonEmpty && a.output.nonEmpty, "--input and --output are required")
    a
  }

  final case class Summary(
      runId: String,
      nTurns: Long,
      wallMs: Long,
      turnsPerSec: Double,
      stagesRun: Seq[String],
      stagesSkipped: Seq[String])

  def main(argv: Array[String]): Unit = {
    val b = SparkSession.builder().appName("graft-index-build")
    if (!sys.props.contains("spark.master") && sys.env.get("MASTER").isEmpty)
      b.master("local[*]")
    val spark = b
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = run(spark, parse(argv))
    def jarr(xs: Seq[String]) = xs.map("\"" + _ + "\"").mkString("[", ",", "]")
    // one machine-readable line for harnesses
    println(
      s"""{"run_id":"${s.runId}","n_turns":${s.nTurns},"wall_ms":${s.wallMs},""" +
        s""""turns_per_sec":${s.turnsPerSec},"stages_run":${jarr(s.stagesRun)},""" +
        s""""stages_skipped":${jarr(s.stagesSkipped)}}""")
    spark.stop()
  }

  def run(spark: SparkSession, a: Args): Summary = {
    import spark.implicits._
    val paths = IndexPaths(a.output)
    val parts = a.partitions.getOrElse(spark.sessionState.conf.numShufflePartitions)
    val runId = java.util.UUID.randomUUID().toString.take(8)
    val ran = scala.collection.mutable.ArrayBuffer[String]()
    val skipped = scala.collection.mutable.ArrayBuffer[String]()
    val t0 = System.nanoTime()

    /** Run `body` unless `stage` already completed against `inputFp`. */
    def stage(name: String, inputFp: String, outputPath: String)(body: => Unit): Unit = {
      if (a.resume && Manifests.isComplete(spark, paths, name, inputFp)) {
        skipped += name
      } else {
        val s0 = System.nanoTime()
        body
        val wallMs = (System.nanoTime() - s0) / 1000000
        Manifests.recordComplete(spark, paths, name, inputFp, outputPath, wallMs)
        Manifests.metric(spark, paths, runId, name, "wall_ms" -> wallMs.toDouble)
        ran += name
      }
    }

    // ---- S1: docID assignment --------------------------------------------
    val inputFp = Catalog.fingerprint(a.input)
    stage("docid_assign", inputFp, paths.corpusSorted) {
      val turns = a.format match {
        case "parquet" => Catalog.readTurnsParquet(spark, a.input)
        case "jsonl" => Catalog.readTurnsJsonl(spark, a.input)
        case f => throw new IllegalArgumentException(s"unknown format $f")
      }
      val numbered = DocIds.assign(turns, parts)
      numbered.write.mode(SaveMode.Overwrite).parquet(paths.corpusSorted)
      Catalog.writeDocidMap(
        Catalog.readNumbered(spark, paths).transform(DocIds.toDocidMap), paths)
    }

    // ---- S2: tokenize + TF + stats ---------------------------------------
    val s1Fp = Catalog.fingerprint(paths.corpusSorted)
    stage("stats", s1Fp, paths.termFreqs) {
      val docs = Catalog.readNumbered(spark, paths).map(t => Doc(t.doc_id, t.text))
      TermFreqs.fromDocs(docs).write.mode(SaveMode.Overwrite).parquet(paths.termFreqs)
      TermFreqs.docLengths(docs).toDF("doc_id", "dl")
        .write.mode(SaveMode.Overwrite).parquet(paths.docLengths)
      val dls = spark.read.parquet(paths.docLengths).as[(Long, Int)]
      val stats = TermFreqs.corpusStats(dls)
      Seq(stats).toDS().write.mode(SaveMode.Overwrite).parquet(paths.corpusStats)
      val tf = spark.read.parquet(paths.termFreqs).as[TermFreqRow]
      TermFreqs.termStats(tf).write.mode(SaveMode.Overwrite).parquet(paths.termStats)
    }

    // ---- S3: salt + SPIMI + bucketed sink --------------------------------
    val s2Fp = Catalog.fingerprint(paths.termFreqs)
    stage("spimi", s2Fp, paths.postings) {
      val tf = spark.read.parquet(paths.termFreqs).as[TermFreqRow]
      val tstats = spark.read.parquet(paths.termStats).as[TermStat]
      val stats = Catalog.readCorpusStats(spark, paths)
      val docIdSpace = docIdSpaceOf(spark, paths)
      val heavy = SaltPlan.heavyTerms(tstats, a.targetRun)
      val salted = SaltPlan.salt(tf, heavy, docIdSpace)
      Catalog.writePostings(Spimi.buildBlocks(salted, stats.avgdl, a.buckets, parts), paths)
    }

    // ---- S4: dictionary + meta (metadata-only merge) ---------------------
    val s3Fp = Catalog.fingerprint(paths.postings)
    stage("finalize", s3Fp, paths.dictionary) {
      val tstats = spark.read.parquet(paths.termStats)
      val blockAgg = spark.read.parquet(paths.postings)
        .groupBy($"term").agg(max($"max_tf_norm").as("max_tf_norm"))
      tstats.join(blockAgg, Seq("term"))
        .select($"term", $"df", $"cf", $"max_tf_norm").as[DictEntry]
        .write.mode(SaveMode.Overwrite).parquet(paths.dictionary)
      Seq(IndexMeta(a.buckets, a.targetRun, docIdSpaceOf(spark, paths)))
        .toDS().write.mode(SaveMode.Overwrite).parquet(paths.meta)
    }

    val wallMs = (System.nanoTime() - t0) / 1000000
    val nTurns = Catalog.readCorpusStats(spark, paths).n_docs
    val tps = if (wallMs == 0) 0.0 else nTurns * 1000.0 / wallMs
    Manifests.metric(spark, paths, runId, "total",
      "wall_ms" -> wallMs.toDouble, "n_turns" -> nTurns.toDouble, "turns_per_sec" -> tps)
    Summary(runId, nTurns, wallMs, tps, ran.toSeq, skipped.toSeq)
  }

  private def docIdSpaceOf(spark: SparkSession, paths: IndexPaths): Long = {
    val r = spark.read.parquet(paths.docLengths).agg(max(col("doc_id"))).head()
    if (r.isNullAt(0)) 0L else r.getLong(0) + 1L
  }
}
