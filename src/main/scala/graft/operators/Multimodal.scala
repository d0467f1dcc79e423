package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Catalog

/** An opaque media payload row: binary content + typed metadata. */
final case class MediaRow(doc_id: Long, media_type: String, content: Array[Byte])

/** Decoded media features. */
final case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    n_bytes: Long,
    width: Int,
    height: Int,
    n_frames: Int,
    feature_norm: Double)

/** Multimodal-column plumbing: images/audio/video as opaque `binary` columns
  * with typed metadata, processed batch-wise in partition-local passes (the
  * Scala analog of a Pandas-UDF `mapInPandas` pipeline — batching amortizes
  * per-call decoder overhead).
  *
  * The decode is REAL, not a stub: [[MediaDecoder]] sniffs the payload's
  * magic bytes and decodes images through the JDK's built-in ImageIO
  * (PNG/JPEG/GIF/BMP) and WAV audio through javax.sound — no external
  * libraries. Unknown payloads degrade to a metadata-only row. Features:
  * image → L2 norm of the 8-bin normalized luminance histogram; audio →
  * normalized RMS amplitude.
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
    * stands in for opaque bytes; deterministic).
    */
  def asMedia(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Catalog.readTable(spark, sfDir, "documents")
      .select($"doc_id", lit("application/octet-stream").as("media_type"),
        encode($"text", "UTF-8").as("content"))
      .as[MediaRow]
  }

  /** Deterministic synthetic PNG per document: a 16×16 image whose pixels
    * are seeded from md5(text), ENCODED with real ImageIO — so the decode
    * path below runs against genuine image bytes end-to-end, distributed.
    */
  def syntheticPngs(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    // PNG encode (and the decode downstream) is the heavy per-row work —
    // parallelize the one-file local scan instead of encoding serially
    Catalog.ensureParallelism(docs).select($"doc_id", $"text").as[(Long, String)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, text) =>
          val seed = java.security.MessageDigest.getInstance("MD5")
            .digest(text.getBytes("UTF-8"))
          val img = new java.awt.image.BufferedImage(16, 16,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < 16) {
            var x = 0
            while (x < 16) {
              val b = seed((y * 16 + x) % seed.length) & 0xff
              img.setRGB(x, y, (b << 16) | (((b * 31) & 0xff) << 8) | ((b * 7) & 0xff))
              x += 1
            }
            y += 1
          }
          val out = new java.io.ByteArrayOutputStream(512)
          javax.imageio.ImageIO.write(img, "png", out)
          MediaRow(id, "image/png", out.toByteArray)
        }
      }
  }

  /** Feature extraction over binary payloads: partition-local batched
    * decode.
    */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(MediaDecoder.decodeBatch)
    }
  }

  /** Driver query: synthesize real PNGs from documents, decode them, return
    * typed features. No SQL oracle (ImageIO is not expressible in DuckDB) —
    * correctness is pinned by MultimodalSpec instead (dimensions, format
    * sniff, histogram determinism).
    */
  def mediaFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    extractFeatures(syntheticPngs(Catalog.readTable(spark, sfDir, "documents")))
      .toDF()
      .select($"doc_id", $"media_type", $"n_bytes", $"width", $"height",
        $"n_frames", round($"feature_norm", 6).as("feature_norm_r6"))
      .orderBy($"doc_id")
  }
}

/** Real JDK-built-in media decoding: magic-byte sniff, ImageIO for images,
  * javax.sound for WAV. Per-batch so a heavier external decoder could slot
  * in without changing the operator shape.
  */
object MediaDecoder {

  def sniff(b: Array[Byte]): String =
    if (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
      "image/png"
    else if (b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8)
      "image/jpeg"
    else if (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F')
      "image/gif"
    else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M')
      "image/bmp"
    else if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')
      "audio/wav"
    else "application/octet-stream"

  private def imageFeatures(m: MediaRow, kind: String): MediaFeatures = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.content))
    if (img == null)
      MediaFeatures(m.doc_id, kind, m.content.length.toLong, 0, 0, 0, 0.0)
    else {
      // 8-bin luminance histogram, L2 norm of the normalized bins
      val hist = new Array[Long](8)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          hist((lum >> 5) & 7) += 1
          x += 1
        }
        y += 1
      }
      val n = img.getWidth.toLong * img.getHeight
      var sq = 0.0
      var i = 0
      while (i < 8) { val f = hist(i).toDouble / n; sq += f * f; i += 1 }
      MediaFeatures(m.doc_id, kind, m.content.length.toLong,
        img.getWidth, img.getHeight, 1, math.sqrt(sq))
    }
  }

  private def wavFeatures(m: MediaRow): MediaFeatures = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(m.content))
    try {
      val fmt = in.getFormat
      val frames = in.getFrameLength.toInt
      val bytes = in.readAllBytes()
      // normalized RMS over 16-bit little-endian samples (the common case)
      var sq = 0.0
      var ns = 0
      if (fmt.getSampleSizeInBits == 16) {
        var i = 0
        while (i + 1 < bytes.length) {
          val s = ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort / 32768.0
          sq += s * s; ns += 1; i += 2
        }
      }
      val rms = if (ns == 0) 0.0 else math.sqrt(sq / ns)
      MediaFeatures(m.doc_id, "audio/wav", m.content.length.toLong,
        0, 0, frames, rms)
    } finally in.close()
  }

  def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] = {
    javax.imageio.ImageIO.setUseCache(false) // no temp files on executors
    batch.map { m =>
      sniff(m.content) match {
        case kind @ ("image/png" | "image/jpeg" | "image/gif" | "image/bmp") =>
          imageFeatures(m, kind)
        case "audio/wav" => wavFeatures(m)
        case other =>
          MediaFeatures(m.doc_id, other, m.content.length.toLong, 0, 0, 0, 0.0)
      }
    }
  }
}
