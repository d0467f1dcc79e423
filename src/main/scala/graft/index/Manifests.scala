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
  def recordComplete(spark: SparkSession, paths: IndexPaths, stage: String,
      inputFingerprint: String, outputPath: String, wallMs: Long): Unit = {
    import spark.implicits._
    val ts = now()
    val perFile: Seq[ManifestEntry] =
      if (new java.io.File(outputPath).exists()) {
        val rowsByFile = spark.read.parquet(outputPath)
          .groupBy(input_file_name().as("file"))
          .agg(count(lit(1)).as("rows"))
          .collect()
          .map(r => r.getString(0) -> r.getLong(1))
          .sortBy(_._1)
        rowsByFile.zipWithIndex.map { case ((file, rows), i) =>
          val bytes =
            try new java.io.File(new java.net.URI(file).getPath).length()
            catch { case _: Exception => 0L }
          ManifestEntry(stage, i, inputFingerprint, rows, bytes, wallMs, s"complete:$file", ts)
        }.toSeq
      } else Seq.empty
    val total = perFile.map(_.rows).sum
    val bytes = perFile.map(_.bytes).sum
    val all = ManifestEntry(stage, -1, inputFingerprint, total, bytes, wallMs, "complete", ts) +: perFile
    all.toDS().write.mode(SaveMode.Append).parquet(paths.manifests)
  }

  def metric(spark: SparkSession, paths: IndexPaths, runId: String, stage: String,
      kvs: (String, Double)*): Unit = {
    import spark.implicits._
    val ts = now()
    kvs.map { case (k, v) => MetricRow(runId, stage, k, v, ts) }
      .toDS().write.mode(SaveMode.Append).parquet(paths.metrics)
  }
}
