package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** BPE pins: determinism of train+encode (the per-word count table the
  * generated DuckDB oracles trust), reference behavior on a hand-computable
  * corpus, and the segmentation invariants.
  */
class BpeSpec extends AnyFunSuite {

  test("hand-computable corpus: merge order and segmentations") {
    // freqs: ("abab", 10), ("abc", 5)
    // round 1 pairs: (a,b)=25, (b,a)=10, (b,c)=5 → merge (a,b)
    // round 2: seqs ab|ab ×10, ab|c ×5 → pairs (ab,ab)=10, (ab,c)=5 → (ab,ab)
    // round 3: seqs abab ×10, ab|c ×5 → (ab,c)=5 → merge (ab,c)
    val m = Bpe.train(Seq("abab" -> 10L, "abc" -> 5L), 3)
    assert(m.merges == Vector(("a", "b"), ("ab", "ab"), ("ab", "c")))
    assert(m.tokens("abab").toSeq == Seq("abab"))
    assert(m.tokens("abc").toSeq == Seq("abc"))
    assert(m.tokens("ababab").toSeq == Seq("abab", "ab"))
    assert(m.tokens("ba").toSeq == Seq("b", "a"))
    assert(m.tokens("xyz").toSeq == Seq("x", "y", "z"))
  }

  test("tie-break is lexicographic: deterministic merge list") {
    // (a,b) and (c,d) both appear once → (a,b) wins the tie
    val m = Bpe.train(Seq("ab" -> 1L, "cd" -> 1L), 1)
    assert(m.merges == Vector(("a", "b")))
    // and training twice gives the identical model
    val freqs = Seq("stream" -> 7L, "string" -> 3L, "strong" -> 3L, "ring" -> 5L)
    assert(Bpe.train(freqs, 10) == Bpe.train(freqs, 10))
  }

  test("segmentation invariants: concatenation restores the word; more merges never split finer") {
    val words = Seq("join", "window", "vector", "stream", "hash", "aggregate",
      "partition", "shuffle", "a", "")
    val corpus = words.filter(_.nonEmpty).map(_ -> 2L)
    val small = Bpe.train(corpus, 3)
    val big = Bpe.train(corpus, 30)
    for (w <- words) {
      assert(small.tokens(w).mkString == w)
      assert(big.tokens(w).mkString == w)
      assert(big.countWord(w) <= small.countWord(w),
        s"more merges must not increase the token count of '$w'")
    }
  }

  test("corpus-trained model is deterministic and counts text consistently") {
    val spark = graft.TestSpark.session
    val sfDir = "/root/testdata/sf0.001"
    val m1 = Bpe.trainFromCorpus(spark, sfDir, numMerges = 50)
    val m2 = Bpe.trainFromCorpus(spark, sfDir, numMerges = 50)
    assert(m1 == m2, "train must be replayable")
    // countText = sum of per-word counts over analyzer tokens
    val text = "join window join vector"
    val want = Analyzer.tokenize(text).map(m1.countWord).sum
    assert(m1.countText(text) == want)
    // on the 31-term vocabulary 50 merges compress: fewer BPE tokens than chars
    val docs = graft.io.Catalog.readDocuments(spark, sfDir).limit(20).collect()
    docs.foreach { d =>
      val toks = Analyzer.tokenize(d.text)
      val chars = toks.map(_.length).sum
      assert(m1.countText(d.text) <= chars)
      assert(m1.countText(d.text) >= toks.length,
        "a word is never fewer than one token")
    }
  }
}
