package graft.bench

import org.apache.spark.sql.{SaveMode, SparkSession}

import graft.Fixtures
import graft.index.IndexBuildJob

/** Two-parallelism scaling protocol (BASELINE.md): the sandbox stand-in for
  * the north rule's N vs 4N executor clusters.
  *
  * Modes:
  *   gen   — generate the transcript fixture (distributed, deterministic)
  *   run   — build the index at local[cores]: 1 warmup build + `reps`
  *           measured builds, print per-rep and median turns/sec
  *
  * Fair measurement = one JVM per parallelism level (JIT state cannot leak
  * between configs), cold output dir per build, identical input files:
  *
  * {{{
  * spark-submit --class graft.bench.ScalingBench <jar> gen 2000 250
  * spark-submit --master local[8]  --conf spark.sql.shuffle.partitions=8 \
  *   --class graft.bench.ScalingBench <jar> run 8 2000 250 3
  * spark-submit --master local[32] --conf spark.sql.shuffle.partitions=32 \
  *   --class graft.bench.ScalingBench <jar> run 32 2000 250 3
  * # efficiency = (T32/T8) / (32/8)
  * }}}
  */
object ScalingBench {

  private def turnsPath(convs: Int, tpc: Int) = s"/tmp/graft-scaling/turns-$convs-$tpc"

  def main(args: Array[String]): Unit = args(0) match {
    case "gen" =>
      val convs = args(1).toInt
      val tpc = args(2).toInt
      val b = SparkSession.builder().appName("graft-scaling-gen")
      if (!sys.props.contains("spark.master")) b.master("local[32]")
      val spark = b.config("spark.sql.session.timeZone", "UTC").getOrCreate()
      import spark.implicits._
      spark.sparkContext.setLogLevel("WARN")
      spark.range(0, convs)
        .repartition(64)
        .flatMap(c => Fixtures.conversation(c.toInt, tpc))
        .write.mode(SaveMode.Overwrite).parquet(turnsPath(convs, tpc))
      spark.stop()

    case "run" =>
      val cores = args(1).toInt
      val convs = args(2).toInt
      val tpc = args(3).toInt
      val reps = args.lift(4).map(_.toInt).getOrElse(3)
      val b = SparkSession.builder().appName(s"graft-scaling-$cores")
      if (!sys.props.contains("spark.master")) b.master(s"local[$cores]")
      val spark = b
        .config("spark.sql.shuffle.partitions", cores.toString)
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")

      def buildOnce(tag: String, input: String = turnsPath(convs, tpc)): Double = {
        val out = s"/tmp/graft-scaling/idx-$cores-$tag"
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
        val s = IndexBuildJob.run(spark, IndexBuildJob.Args(
          input = input, output = out, buckets = 32,
          targetRun = 1 << 16, partitions = Some(cores), resume = false))
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
        val walls = s.stageWalls.map { case (k, v) => s"$k=${v}ms" }.mkString(" ")
        println(s"[scaling] cores=$cores $tag turns/sec=${s.turnsPerSec} | $walls")
        s.turnsPerSec
      }

      // warmup exists to JIT-compile the build's code paths; a 1/8-size
      // corpus does that at a fraction of the wall time
      val warmPath = turnsPath(convs / 8, tpc)
      if (!new java.io.File(warmPath).exists()) {
        import spark.implicits._
        spark.range(0, convs / 8).repartition(64)
          .flatMap(c => graft.Fixtures.conversation(c.toInt, tpc))
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(warmPath)
      }
      buildOnce("warmup", warmPath)
      val measured = (1 to reps).map(r => buildOnce(s"rep$r"))
      val med = measured.sorted.apply(measured.size / 2)
      println(
        s"""{"cores":$cores,"n_turns":${convs.toLong * tpc},"reps":[${measured.mkString(",")}],""" +
          s""""median_turns_per_sec":$med}""")
      spark.stop()

    // bytes-moved accounting: one build with a SparkListener totalling
    // input/output/shuffle bytes across all jobs — pins the scaling residual
    // to the bytes the single shared memory bus must move (each real cluster
    // node multiplies buses + disks; local[N] multiplies only cores)
    case "audit" =>
      val cores = args(1).toInt
      val convs = args(2).toInt
      val tpc = args(3).toInt
      val b = SparkSession.builder().appName(s"graft-scaling-audit")
      if (!sys.props.contains("spark.master")) b.master(s"local[$cores]")
      val spark = b
        .config("spark.sql.shuffle.partitions", cores.toString)
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      // in, out, shuffle write/read, rdd-cache bytes stored (the r4 build
      // persists the exchanged corpus DISK_ONLY across S1→S2 — those bytes
      // cross the bus too and task metrics don't count them; block updates
      // do, so the audit stays an honest bus-bytes census)
      val acc = new java.util.concurrent.atomic.AtomicLongArray(5)
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) {
            acc.addAndGet(0, m.inputMetrics.bytesRead)
            acc.addAndGet(1, m.outputMetrics.bytesWritten)
            acc.addAndGet(2, m.shuffleWriteMetrics.bytesWritten)
            acc.addAndGet(3, m.shuffleReadMetrics.totalBytesRead)
          }
        }
        override def onBlockUpdated(
            e: org.apache.spark.scheduler.SparkListenerBlockUpdated): Unit = {
          val i = e.blockUpdatedInfo
          if (i.blockId.isRDD)
            acc.addAndGet(4, math.max(0L, i.diskSize) + math.max(0L, i.memSize))
        }
      })
      val out = s"/tmp/graft-scaling/idx-audit-$cores"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
      def snap(): Array[Long] = Array.tabulate(5)(acc.get)
      val before = snap()
      val s = IndexBuildJob.run(spark, IndexBuildJob.Args(
        input = turnsPath(convs, tpc), output = out, buckets = 32,
        targetRun = 1 << 16, partitions = Some(cores), resume = false))
      Thread.sleep(2000) // let the async listener bus drain task-end events
      val d = snap().zip(before).map { case (a2, b2) => a2 - b2 }
      val gb = d.map(x => f"${x / 1e9}%.2f")
      println(s"""{"mode":"audit","cores":$cores,"n_turns":${convs.toLong * tpc},""" +
        s""""turns_per_sec":${s.turnsPerSec},""" +
        s""""input_gb":${gb(0)},"output_gb":${gb(1)},"shuffle_write_gb":${gb(2)},""" +
        s""""shuffle_read_gb":${gb(3)},"cache_stored_gb":${gb(4)},"stage_walls_ms":${
          s.stageWalls.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")}}""")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
      spark.stop()

    case m => throw new IllegalArgumentException(s"unknown mode $m (gen|run|audit)")
  }
}
