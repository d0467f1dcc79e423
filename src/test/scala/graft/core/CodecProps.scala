package graft.core

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property suite for the delta+VByte codec (SURVEY.md §5.2 `codec`). */
object CodecProps extends Properties("Codec") {

  private val sortedDocIds: Gen[Array[Long]] =
    for {
      n <- Gen.chooseNum(0, 400)
      // gaps include 1 (dense runs) and huge values (2^62-ish jumps)
      gaps <- Gen.listOfN(n, Gen.frequency(
        8 -> Gen.chooseNum(1L, 10L),
        4 -> Gen.chooseNum(1L, 1000000L),
        1 -> Gen.chooseNum(1L, (1L << 52)))) // capped so 400 gaps can't overflow Long
      start <- Gen.chooseNum(0L, 1L << 32)
    } yield gaps.scanLeft(start)(_ + _).toArray

  property("delta roundtrip") = forAll(sortedDocIds) { ids =>
    Codec.decodeDeltas(Codec.encodeDeltas(ids), ids.length).sameElements(ids)
  }

  property("delta roundtrip incl zero start") = Prop {
    val ids = Array(0L, 1L, 2L, 130L, Long.MaxValue / 2)
    Codec.decodeDeltas(Codec.encodeDeltas(ids), ids.length).sameElements(ids)
  }

  private val intArrays: Gen[Array[Int]] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.chooseNum(0, 200),
      2 -> Gen.chooseNum(0, Int.MaxValue))).map(_.toArray)

  property("int roundtrip") = forAll(intArrays) { vs =>
    Codec.decodeInts(Codec.encodeInts(vs), vs.length).sameElements(vs)
  }

  property("small values take one byte") = Prop {
    Codec.encodeInts(Array(0, 1, 64, 127)).length == 4
  }

  property("non-increasing rejected") = Prop.throws(classOf[IllegalArgumentException]) {
    Codec.encodeDeltas(Array(5L, 5L))
  }
}
