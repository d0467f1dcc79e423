package graft.core

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property suite for block building (SURVEY.md §5.2 `blockmax`). */
object BlocksProps extends Properties("Blocks") {

  private case class Posting(doc: Long, tf: Int, dl: Int)

  private val postingsGen: Gen[List[Posting]] =
    for {
      n <- Gen.chooseNum(1, 600)
      gaps <- Gen.listOfN(n, Gen.chooseNum(1L, 5000L))
      tfs <- Gen.listOfN(n, Gen.chooseNum(1, 50))
      dls <- Gen.listOfN(n, Gen.chooseNum(1, 500))
    } yield {
      val docs = gaps.scanLeft(-1L)(_ + _).tail
      docs.lazyZip(tfs).lazyZip(dls).map(Posting(_, _, _))
    }

  private val avgdl = 54.3

  property("blocks roundtrip and cover all postings in order") =
    forAll(postingsGen) { ps =>
      val blocks = Blocks.build("t", 0, ps.iterator.map(p => (p.doc, p.tf, p.dl)),
        avgdl, 16).toList
      val decoded = blocks.flatMap { b =>
        val d = Blocks.decode(b)
        d.docs.indices.map(i => Posting(d.docs(i), d.tfs(i), d.dls(i)))
      }
      decoded == ps
    }

  property("block invariants: sizes, ranges, max bounds") =
    forAll(postingsGen) { ps =>
      val blocks = Blocks.build("t", 3, ps.iterator.map(p => (p.doc, p.tf, p.dl)),
        avgdl, 16).toList
      Prop.all(
        Prop(blocks.zipWithIndex.forall { case (b, i) => b.block_idx == i }) :| "block_idx dense",
        Prop(blocks.forall(b => b.n_docs > 0 && b.n_docs <= Blocks.BlockSize)) :| "size bound",
        Prop(blocks.forall(_.run_id == 3)) :| "run id",
        Prop(blocks.forall { b =>
          val d = Blocks.decode(b)
          b.first_doc == d.docs.head && b.last_doc == d.docs.last &&
            b.max_tf == d.tfs.max && b.min_dl == d.dls.min &&
            b.sum_tf == d.tfs.map(_.toLong).sum &&
            // ∀ doc ∈ block: tfNorm ≤ max_tf_norm, with exact max attained
            d.docs.indices.forall(i =>
              Bm25.tfNorm(d.tfs(i), d.dls(i).toLong, avgdl) <= b.max_tf_norm) &&
            d.docs.indices.exists(i =>
              Bm25.tfNorm(d.tfs(i), d.dls(i).toLong, avgdl) == b.max_tf_norm)
        }) :| "per-block maxima exact")
    }

  property("bucketOf stable and in range") = forAll(Gen.alphaNumStr) { t =>
    val b = Blocks.bucketOf(t, 32)
    b >= 0 && b < 32 && b == Blocks.bucketOf(t, 32)
  }
}
