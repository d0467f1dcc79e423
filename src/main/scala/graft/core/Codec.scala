package graft.core

import java.io.ByteArrayOutputStream

/** Delta + variable-byte codec for posting lists (SURVEY.md §2 row 11;
  * encoding per Manning/Raghavan/Schütze, *Introduction to Information
  * Retrieval* §5.3: gap encoding + VByte).
  *
  * VByte layout = LEB128: little-endian 7-bit groups, high bit set on every
  * non-final byte. Values must be non-negative.
  *
  * DocID runs are stored as `VByte(first)` followed by `VByte(gap_i)` where
  * `gap_i = doc_i − doc_{i−1} ≥ 1` (docIDs strictly increasing). tf / dl
  * streams are plain VByte (no deltas; tfs are small so VByte ≈ 1 byte each).
  */
object Codec {

  @inline private def writeVLong(out: ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    require(v >= 0, s"VByte requires non-negative values, got $v")
    while ((v & ~0x7fL) != 0L) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  /** Encode a strictly-increasing docID run as first + gaps. */
  def encodeDeltas(sorted: Array[Long]): Array[Byte] = {
    val out = new ByteArrayOutputStream(sorted.length + 4)
    var prev = 0L
    var i = 0
    while (i < sorted.length) {
      val v = sorted(i)
      if (i == 0) writeVLong(out, v)
      else {
        require(v > prev, s"docIDs must be strictly increasing: $prev !< $v")
        writeVLong(out, v - prev)
      }
      prev = v
      i += 1
    }
    out.toByteArray
  }

  /** Decode `n` docIDs from a delta-encoded run. */
  def decodeDeltas(bytes: Array[Byte], n: Int): Array[Long] = {
    val out = new Array[Long](n)
    var pos = 0
    var prev = 0L
    var i = 0
    while (i < n) {
      var shift = 0
      var v = 0L
      var b = 0
      do {
        b = bytes(pos) & 0xff
        pos += 1
        v |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      prev = if (i == 0) v else prev + v
      out(i) = prev
      i += 1
    }
    out
  }

  /** Encode non-negative ints (tf / dl streams), plain VByte. */
  def encodeInts(values: Array[Int]): Array[Byte] = {
    val out = new ByteArrayOutputStream(values.length + 4)
    var i = 0
    while (i < values.length) {
      writeVLong(out, values(i).toLong)
      i += 1
    }
    out.toByteArray
  }

  def decodeInts(bytes: Array[Byte], n: Int): Array[Int] = {
    val out = new Array[Int](n)
    var pos = 0
    var i = 0
    while (i < n) {
      var shift = 0
      var v = 0L
      var b = 0
      do {
        b = bytes(pos) & 0xff
        pos += 1
        v |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      out(i) = v.toInt
      i += 1
    }
    out
  }
}
