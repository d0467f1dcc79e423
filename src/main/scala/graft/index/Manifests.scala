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

  /** True iff `stage` already completed against this exact input snapshot. */
  def isComplete(spark: SparkSession, paths: IndexPaths, stage: String,
      inputFingerprint: String): Boolean = {
    import spark.implicits._
    if (!new java.io.File(paths.manifests).exists()) return false
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
    * per-build overhead in the scaling protocol).
    */
  private def footerCounts(outputPath: String): Seq[(String, Long, Long)] = {
    import org.apache.hadoop.conf.Configuration
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = new Configuration()
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f)
      else Seq.empty
    // parallel footer reads: serial driver-side opens anti-scale with the
    // partition count (32 files x ~50ms showed up as per-build overhead)
    val files = walk(new java.io.File(outputPath)).sortBy(_.getPath)
    import scala.jdk.CollectionConverters._
    new java.util.ArrayList(files.asJava).parallelStream().map[(String, Long, Long)] { f =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(f.getPath), conf))
      try (f.getPath, reader.getRecordCount, f.length())
      finally reader.close()
    }.collect(java.util.stream.Collectors.toList[(String, Long, Long)]).asScala.toSeq
  }

  def recordComplete(spark: SparkSession, paths: IndexPaths, stage: String,
      inputFingerprint: String, outputPath: String, wallMs: Long): Unit = {
    import spark.implicits._
    val ts = now()
    val perFile: Seq[ManifestEntry] =
      if (new java.io.File(outputPath).exists()) {
        footerCounts(outputPath).zipWithIndex.map { case ((file, rows, bytes), i) =>
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
