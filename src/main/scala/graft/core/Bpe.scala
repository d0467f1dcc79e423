package graft.core

/** Byte-pair encoding (Sennrich, Haddow & Birch, ACL 2016 — the public
  * subword algorithm every modern LM tokenizer descends from), built for
  * MODEL-token accounting in the curation operators: `pack_sequences` /
  * `token_counts` previously budgeted by analyzer tokens, but a real
  * pre-training pipeline packs by BPE count (VERDICT r3 "what's missing"
  * #6).
  *
  * Everything is deterministic and replayable, the IVF-train discipline:
  *   - TRAIN on the `sampleCap` lowest-docID documents (a bounded driver
  *     sample — exactly how production tokenizers are trained offline on a
  *     corpus sample, then applied corpus-wide);
  *   - ties in pair frequency break to the lexicographically smallest
  *     pair, so the merge list is a pure function of the sample;
  *   - ENCODE applies merges strictly in rank order (repeatedly merge the
  *     lowest-rank adjacent pair present — the reference BPE inference
  *     loop), so any two executors produce identical segmentations.
  *
  * Merges never cross word boundaries (symbols start per analyzer token),
  * so a text's BPE count is the sum of its words' counts — which is what
  * makes the corpus-scale aggregation DuckDB-checkable: the per-word
  * count table (tiny: the corpus vocabulary) is generated from the model
  * and pinned by BpeSpec, the distributed per-doc aggregation by the
  * oracle.
  */
object Bpe {

  final case class Model(merges: Vector[(String, String)]) extends Serializable {

    @transient private lazy val rank: Map[(String, String), Int] =
      merges.iterator.zipWithIndex.map { case (p, i) => p -> i }.toMap

    /** Segment one word: char symbols, then repeatedly merge every
      * occurrence of the lowest-rank adjacent pair present.
      */
    def tokens(word: String): Array[String] = {
      if (word.isEmpty) return Array.empty
      var parts: Array[String] = word.toCharArray.map(_.toString)
      var done = parts.length < 2
      while (!done) {
        var best = Int.MaxValue
        var i = 0
        while (i < parts.length - 1) {
          val r = rank.getOrElse((parts(i), parts(i + 1)), Int.MaxValue)
          if (r < best) best = r
          i += 1
        }
        if (best == Int.MaxValue) done = true
        else {
          val (a, b) = merges(best)
          val out = new scala.collection.mutable.ArrayBuffer[String](parts.length)
          var j = 0
          while (j < parts.length) {
            if (j < parts.length - 1 && parts(j) == a && parts(j + 1) == b) {
              out += a + b
              j += 2
            } else {
              out += parts(j)
              j += 1
            }
          }
          parts = out.toArray
          done = parts.length < 2
        }
      }
      parts
    }

    // per-word memo: the corpus-wide counting pass would otherwise re-run
    // the merge loop once per OCCURRENCE (O(total tokens)) where once per
    // DISTINCT word (O(vocabulary)) suffices; concurrent tasks share the
    // broadcast model, hence the concurrent map
    @transient private lazy val countMemo =
      new java.util.concurrent.ConcurrentHashMap[String, Integer]()

    def countWord(word: String): Int =
      countMemo.computeIfAbsent(word, w => tokens(w).length)

    /** BPE token count of a text = Σ over its analyzer tokens. */
    def countText(text: String): Long = {
      val ws = Analyzer.tokenize(text)
      var s = 0L
      var i = 0
      while (i < ws.length) { s += countWord(ws(i)); i += 1 }
      s
    }
  }

  /** Train `numMerges` merges over (word, frequency) pairs. Deterministic:
    * the most frequent adjacent pair wins each round, ties to the
    * lexicographically smallest (a, b).
    */
  def train(wordFreqs: Seq[(String, Long)], numMerges: Int): Model = {
    var seqs: Array[(Array[String], Long)] = wordFreqs
      .sortBy(_._1)
      .map { case (w, f) => (w.toCharArray.map(_.toString), f) }
      .toArray
    val merges = Vector.newBuilder[(String, String)]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap[(String, String), Long]()
      seqs.foreach { case (parts, f) =>
        var i = 0
        while (i < parts.length - 1) {
          val k = (parts(i), parts(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        seqs = seqs.map { case (parts, f) =>
          if (parts.length < 2) (parts, f)
          else {
            val out = new scala.collection.mutable.ArrayBuffer[String](parts.length)
            var j = 0
            while (j < parts.length) {
              if (j < parts.length - 1 && parts(j) == best._1 && parts(j + 1) == best._2) {
                out += best._1 + best._2
                j += 2
              } else {
                out += parts(j)
                j += 1
              }
            }
            (out.toArray, f)
          }
        }
        m += 1
      }
    }
    Model(merges.result())
  }

  /** Train over the `sampleCap` lowest-docID documents of a corpus — a
    * bounded deterministic driver sample (the IVF-train recipe).
    */
  def trainFromCorpus(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      numMerges: Int = 200, sampleCap: Int = 4096): Model = {
    import spark.implicits._
    val sample = graft.io.Catalog.readDocuments(spark, sfDir)
      .orderBy($"doc_id")
      .limit(sampleCap)
      .collect()
    val freqs = sample.iterator
      .flatMap(d => Analyzer.tokenize(d.text))
      .foldLeft(scala.collection.mutable.HashMap[String, Long]()) { (m, w) =>
        m.update(w, m.getOrElse(w, 0L) + 1L); m
      }
    train(freqs.toSeq, numMerges)
  }
}
