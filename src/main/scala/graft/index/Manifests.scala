package graft.index

import java.sql.Timestamp

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Catalog.IndexPaths
import graft.model.{ManifestEntry, MetricRow}

/** Per-partition lineage manifests + build metrics, written alongside the
  * index segments (SURVEY.md §2 rows 21–22; north-star requirement).
  *
  * A stage is resumable when a `complete` summary row exists whose
  * `input_fingerprint` matches the stage's current input snapshot
  * (Iceberg snapshot-id in production; file-listing hash in the sandbox —
  * Catalog.fingerprint). Per-partition rows record what is inside each
  * written partition file: lineage granular enough to audit or re-verify a
  * single partition of a 10^12-turn build without replaying the stage.
  */
object Manifests {

  private def now() = new Timestamp(System.currentTimeMillis())

  /** True iff `stage` already completed against this exact input snapshot.
    * An "absent" fingerprint (input not found) never matches — a stage whose
    * input cannot be verified must re-run, not skip against a stale record.
    */
  def isComplete(spark: SparkSession, paths: IndexPaths, stage: String,
      inputFingerprint: String): Boolean = {
    import spark.implicits._
    if (inputFingerprint == "absent") return false
    if (!graft.io.Fs.exists(paths.manifests)) return false
    spark.read.parquet(paths.manifests).as[ManifestEntry]
      .filter(m => m.stage == stage && m.partition_id == -1 &&
        m.input_fingerprint == inputFingerprint && m.status == "complete")
      .limit(1).count() > 0
  }

  /** Record a completed stage: one summary row (partition_id = −1) plus one
    * row per written partition file of `outputPath` (rows counted from the
    * files themselves — the manifest describes what is actually on disk, not
    * what the stage intended to write).
    */
  /** Per-file row counts from parquet FOOTERS — metadata only, no data scan
    * (an extra full read of every stage output showed up as ~20s of fixed
    * per-build overhead in the scaling protocol). Listing goes through the
    * Hadoop FileSystem API (local/HDFS/S3 alike); footer reads run
    * driver-parallel for small outputs and as a distributed Spark job above
    * [[DistributeThreshold]] files — at 10^6-file scale a driver-side walk
    * is the bottleneck (VERDICT r1 item 7).
    */
  private val DistributeThreshold = 64

  private def footerOf(pathStr: String, conf: org.apache.hadoop.conf.Configuration): Long = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(pathStr), conf))
    try reader.getRecordCount finally reader.close()
  }

  private def footerCounts(spark: SparkSession,
      outputPath: String): Seq[(String, Long, Long)] = {
    val files = graft.io.Fs.listDataFiles(outputPath)
      .filter(_._1.endsWith(".parquet"))
    if (files.isEmpty) Seq.empty
    else if (files.length <= DistributeThreshold) {
      // driver-parallel: serial opens anti-scale with partition count
      import scala.jdk.CollectionConverters._
      val conf = graft.io.Fs.conf()
      new java.util.ArrayList(files.asJava).parallelStream()
        .map[(String, Long, Long)] { case (f, bytes, _) => (f, footerOf(f, conf), bytes) }
        .collect(java.util.stream.Collectors.toList[(String, Long, Long)])
        .asScala.toSeq.sortBy(_._1)
    } else {
      // distributed: one task batch over the file list, conf shipped along
      import spark.implicits._
      val bcConf = spark.sparkContext.broadcast(
        new graft.io.SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
      spark.createDataset(files.map { case (f, bytes, _) => (f, bytes) })
        .repartition(spark.sparkContext.defaultParallelism)
        .mapPartitions { it =>
          val conf = bcConf.value.get
          it.map { case (f, bytes) => (f, footerOf(f, conf), bytes) }
        }
        .collect().toSeq.sortBy(_._1)
    }
  }

  def recordComplete(spark: SparkSession, paths: IndexPaths, stage: String,
      inputFingerprint: String, outputPath: String, wallMs: Long): Unit = {
    import spark.implicits._
    val ts = now()
    val perFile: Seq[ManifestEntry] =
      if (graft.io.Fs.exists(outputPath)) {
        footerCounts(spark, outputPath).zipWithIndex.map { case ((file, rows, bytes), i) =>
          ManifestEntry(stage, i, inputFingerprint, rows, bytes, wallMs, s"complete:$file", ts)
        }
      } else Seq.empty
    val total = perFile.map(_.rows).sum
    val bytes = perFile.map(_.bytes).sum
    val all = ManifestEntry(stage, -1, inputFingerprint, total, bytes, wallMs, "complete", ts) +: perFile
    all.toDS().write.mode(SaveMode.Append).parquet(paths.manifests)
  }

  /** Append metric rows (stage, key, value) in one write. */
  def metric(spark: SparkSession, paths: IndexPaths, runId: String,
      rows: (String, String, Double)*): Unit = {
    import spark.implicits._
    val ts = now()
    rows.map { case (stage, k, v) => MetricRow(runId, stage, k, v, ts) }
      .toDS().coalesce(1).write.mode(SaveMode.Append).parquet(paths.metrics)
  }
}
