package graft.core

import org.scalatest.funsuite.AnyFunSuite

class Bm25Spec extends AnyFunSuite {

  test("idf matches Lucene BM25 formula on hand cases") {
    // N=500, df=250 → ln(1 + 250.5/250.5) = ln 2
    assert(math.abs(Bm25.idf(500, 250) - math.log(2.0)) < 1e-12)
    // rare term has higher idf than common term
    assert(Bm25.idf(500, 1) > Bm25.idf(500, 499))
    // df = N still yields positive idf (BM25+-style lower bound via the 1+)
    assert(Bm25.idf(500, 500) > 0.0)
  }

  test("tfNorm saturates in tf and decreases in dl") {
    val a = Bm25.tfNorm(1, 50, 50.0)
    val b = Bm25.tfNorm(10, 50, 50.0)
    val c = Bm25.tfNorm(1000, 50, 50.0)
    assert(a < b && b < c && c < 1.0)
    assert(Bm25.tfNorm(2, 100, 50.0) < Bm25.tfNorm(2, 10, 50.0))
  }

  test("tfNorm exact value at dl == avgdl") {
    // tf/(tf + k1) at dl == avgdl: 3/(3+1.2)
    assert(math.abs(Bm25.tfNorm(3, 50, 50.0) - 3.0 / 4.2) < 1e-12)
  }

  test("QueryModel sorts and dedups terms, tolerates absent terms") {
    val qm = QueryModel.build(Seq("Window", "join", "window"), 100,
      Map("join" -> 10L, "window" -> 20L), 54.0, 10)
    assert(qm.terms.toSeq == Seq("join", "window"))
    assert(qm.idfs(0) == Bm25.idf(100, 10))
    val qm2 = QueryModel.build(Seq("zebra"), 100, Map.empty, 54.0, 10)
    assert(qm2.terms.toSeq == Seq("zebra") && qm2.idfs(0) == Bm25.idf(100, 0))
  }
}
