package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Catalog

/** An opaque media payload row: binary content + typed metadata. */
final case class MediaRow(doc_id: Long, media_type: String, content: Array[Byte])

/** Decoded (stubbed) media features. */
final case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    n_bytes: Long,
    width: Int,
    height: Int,
    n_frames: Int,
    feature_norm: Double)

/** Multimodal-column plumbing: images/audio/video as opaque `binary` columns
  * with typed metadata, processed batch-wise in partition-local passes.
  *
  * The decode itself is STUBBED (no media libs in this container) with a
  * deterministic fake driven by the payload bytes; everything Spark-side —
  * schema, binary column handling, partition batching, the operator
  * signature — is real and tested. Swapping in a real decoder touches only
  * [[MultimodalStub.decodeBatch]].
  */
object Multimodal {

  /** Oracled metadata pass over the binary payload column: byte length +
    * content digest (pure Column DSL — pushdown-friendly, no UDF).
    */
  def mediaMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    asMedia(spark, sfDir).toDF()
      .select($"doc_id",
        octet_length($"content").cast("long").as("n_bytes"),
        md5($"content").as("content_md5"))
      .orderBy($"doc_id")
  }

  /** The documents table re-cast as a binary media table (UTF-8 payload
    * stands in for image bytes; deterministic).
    */
  def asMedia(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Catalog.readTable(spark, sfDir, "documents")
      .select($"doc_id", lit("image/fake").as("media_type"),
        encode($"text", "UTF-8").as("content"))
      .as[MediaRow]
  }

  /** Feature extraction over binary payloads: partition-local batched decode
    * (the Scala analog of a Pandas-UDF `mapInPandas` pipeline — batches keep
    * the per-call overhead of a real decoder amortized).
    */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(MultimodalStub.decodeBatch)
    }
  }
}

/** The stubbed decoder: a real implementation would call into an image/audio
  * library here (per batch). The fake derives metadata deterministically
  * from the payload so tests are stable.
  */
object MultimodalStub {
  def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] =
    batch.map { m =>
      val n = m.content.length
      // deterministic fake: dimensions from simple byte folds
      var acc = 0
      var i = 0
      while (i < n) { acc = (acc * 31 + (m.content(i) & 0xff)) & 0x7fffffff; i += 1 }
      val width = 64 + (acc % 512)
      val height = 64 + ((acc / 512) % 512)
      MediaFeatures(m.doc_id, m.media_type, n.toLong, width, height,
        n_frames = 1, feature_norm = (acc % 1000000) / 1000000.0)
    }
}
