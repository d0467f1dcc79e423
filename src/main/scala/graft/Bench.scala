package graft

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Driver-run benchmark: times every SparkEntry query at SPARK_GRAFT_SF_DIR
  * and prints ONE JSON line. Also measures transcript index-build throughput
  * (turns/sec) over a deterministic synthetic corpus (FIXTURES.md §T) —
  * the north-rule headline metric — as the extra key `build_turns_per_sec`.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // Warm up the build-once index artifacts (scored index, positional
    // index, LSH bucket table) so per-query timings measure queries, not
    // one-time builds — the artifacts are built once and probed many times
    // in production, and their build cost is measured separately
    // (build_turns_per_sec / ScalingBench).
    IndexCache.documentsIndex(spark, sfDir)
    IndexCache.positionalIndex(spark, sfDir)
    IndexCache.lshBucketsPath(spark, sfDir)            // ANN probes (planes=8)
    IndexCache.lshBucketsPath(spark, sfDir, planes = 4) // near-dup pairs
    IndexCache.keywordField(spark, sfDir, "source")    // filter postings
    IndexCache.deletedIndex(spark, sfDir, Seq("stream")) // tombstoned variant
    IndexCache.purgedIndex(spark, sfDir, Seq("stream"))  // expunge-merged variant
    IndexCache.titleIndex(spark, sfDir)                  // multi_match subfield
    IndexCache.ivf(spark, sfDir)                         // IVF coarse quantizer
    IndexCache.ivfPq(spark, sfDir)                       // IVF-PQ codes table
    IndexCache.englishIndex(spark, sfDir)                // stop+stem variant
    IndexCache.synonymsIndex(spark, sfDir)               // index-time synonyms
    IndexCache.edgeNgramIndex(spark, sfDir)              // search_as_you_type grams
    IndexCache.reindexedSource(spark, sfDir, "src2")     // _reindex target
    IndexCache.bigramIndex(spark, sfDir)                 // bigram-LM artifact
    IndexCache.completionPath(spark, sfDir)              // completion artifact

    // a failed query must never masquerade as a fast timing: it reports -1
    // and lands in failed_queries (ADVICE r1)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable => System.err.println(s"BENCH FAIL $name: $e"); false }
      (name, if (ok) (System.nanoTime() - t0) / 1e9 else -1.0, ok)
    }

    // Index-build throughput over a synthetic transcript corpus sized to the
    // bench scale (~100k turns), cold build, distributed generation.
    val buildTps = {
      val base = s"/tmp/graft-bench-${java.util.UUID.randomUUID().toString.take(8)}"
      spark.range(0, 500).repartition(32)
        .flatMap(c => Fixtures.conversation(c.toInt, 200))
        .write.mode(SaveMode.Overwrite).parquet(s"$base/turns")
      val s = index.IndexBuildJob.run(spark, index.IndexBuildJob.Args(
        input = s"$base/turns", output = s"$base/idx",
        buckets = 16, targetRun = 1 << 16))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
      s.turnsPerSec
    }

    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => k }
    val total = results.collect { case (_, v, true) => v }.sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""build_turns_per_sec":$buildTps,"n_queries":${results.size},""" +
        s""""n_failed":${failed.size},"failed_queries":${failed.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
        s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
