package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Real media decode through JDK ImageIO / javax.sound: format sniffing,
  * dimension extraction, histogram features, audio RMS — on genuine bytes.
  */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  test("synthetic PNGs round-trip through real ImageIO decode, distributed") {
    import spark.implicits._
    val docs = Seq((1L, "hello world"), (2L, "join hash row"), (3L, ""))
      .toDF("doc_id", "text")
    val feats = Multimodal.extractFeatures(Multimodal.syntheticPngs(docs))
      .collect().sortBy(_.doc_id)
    assert(feats.length == 3)
    feats.foreach { f =>
      assert(f.media_type == "image/png")
      assert(f.width == 16 && f.height == 16 && f.n_frames == 1)
      assert(f.n_bytes > 50) // a real PNG container, not a raw buffer
      assert(f.feature_norm > 0.0 && f.feature_norm <= 1.0)
    }
    // deterministic: same text -> same bytes -> same features
    val again = Multimodal.extractFeatures(Multimodal.syntheticPngs(docs))
      .collect().sortBy(_.doc_id)
    assert(again.toSeq == feats.toSeq)
  }

  test("decoder sniffs formats and decodes a real JPEG and WAV") {
    // JPEG via ImageIO encode of a small image
    val img = new java.awt.image.BufferedImage(5, 7, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 7).foreach(y => (0 until 5).foreach(x => img.setRGB(x, y, (x * 40) << 16)))
    val jout = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", jout)
    val jpeg = MediaDecoder.decodeBatch(Seq(MediaRow(1L, "?", jout.toByteArray))).head
    assert(jpeg.media_type == "image/jpeg" && jpeg.width == 5 && jpeg.height == 7)

    // WAV: 100 frames of a 16-bit mono square wave at 8kHz
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val samples = new Array[Byte](200)
    (0 until 100).foreach { i =>
      val v: Short = if (i % 2 == 0) 16384 else -16384
      samples(2 * i) = (v & 0xff).toByte
      samples(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val ain = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(samples), fmt, 100)
    val wout = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ain,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, wout)
    val wav = MediaDecoder.decodeBatch(Seq(MediaRow(2L, "?", wout.toByteArray))).head
    assert(wav.media_type == "audio/wav" && wav.n_frames == 100)
    assert(math.abs(wav.feature_norm - 0.5) < 0.01) // RMS of a +/-0.5 square wave
  }

  test("unknown payloads degrade to metadata-only rows") {
    val f = MediaDecoder.decodeBatch(Seq(MediaRow(9L, "?", "just text".getBytes))).head
    assert(f.media_type == "application/octet-stream")
    assert(f.n_bytes == 9L && f.width == 0 && f.n_frames == 0)
  }
}
