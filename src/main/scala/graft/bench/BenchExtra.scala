package graft.bench

import org.apache.spark.sql.SparkSession

/** Builder-side micro-bench (guide §1.4): times a NAMED SUBSET of
  * SparkEntry.queries with the noop sink (computes every column of every
  * row, no output cost) instead of Bench's count(). Never run by the
  * driver; Bench.scala stays the frozen harness.
  *
  * Usage: runMain graft.bench.BenchExtra <q1,q2,...> [repeats]
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as Bench).
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val repeats = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // same artifact warm-up as Bench so timings are query-only
    graft.IndexCache.documentsIndex(spark, sfDir)
    graft.IndexCache.positionalIndex(spark, sfDir)
    graft.IndexCache.lshBucketsPath(spark, sfDir)
    graft.IndexCache.lshBucketsPath(spark, sfDir, planes = 4)
    graft.IndexCache.keywordField(spark, sfDir, "source")
    graft.IndexCache.titleIndex(spark, sfDir)
    graft.IndexCache.ivf(spark, sfDir)
    graft.IndexCache.ivfPq(spark, sfDir)
    graft.IndexCache.bigramIndex(spark, sfDir)

    val out = names.map { name =>
      val fn = graft.SparkEntry.queries(name)
      val countMode = args.lift(2).contains("count")
      val ts = (1 to repeats).map { i =>
        spark.sparkContext.setJobDescription(s"$name#$i")
        val t0 = System.nanoTime()
        if (countMode) fn(spark, sfDir).count()
        else fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      spark.sparkContext.setJobDescription(null)
      f""""$name":{"min":${ts.min}%.3f,"med":${ts.sorted.apply(ts.size / 2)}%.3f,"all":[${ts.map(t => f"$t%.3f").mkString(",")}]}"""
    }
    println(out.mkString("{", ",", "}"))
    spark.stop()
  }
}

/** Dumps `.explain("formatted")` of named queries to files for the plan
  * evidence the optimization rounds commit (plans/rNN/<q>_<tag>.txt).
  *
  * Usage: runMain graft.bench.PlanDump <outDir> <tag> <q1,q2,...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val (outDir, tag) = (args(0), args(1))
    val names = args(2).split(',').toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"), plan)
      println(s"dumped $name -> $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
