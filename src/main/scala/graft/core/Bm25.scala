package graft.core

/** Pinned BM25 scoring semantics (SURVEY.md §1.4).
  *
  * Formula per Lucene ≥8 `BM25Similarity` (LUCENE-8563 form — the constant
  * `(k1+1)` numerator removed; rank-equivalent to classic BM25):
  *
  * {{{
  * idf(t)      = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))
  * tfNorm(t,d) = tf(t,d) / (tf(t,d) + k1·(1 − b + b·dl(d)/avgdl))
  * score(q,d)  = Σ_{t ∈ uniq(q)} idf(t) · tfNorm(t,d)
  * }}}
  *
  * k1 = 1.2, b = 0.75 (normative, BASELINE.json). `dl` is the analyzed token
  * count; `avgdl` the exact corpus mean (not Lucene's lossy 1-byte norm).
  *
  * Determinism: scores sum query-term contributions in sorted term order and
  * ties break `(score DESC, doc_id ASC)` — bit-identical across runs and
  * parallelism levels.
  */
object Bm25 {
  val K1 = 1.2
  val B  = 0.75

  def idf(nDocs: Long, df: Long): Double =
    math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5))

  def tfNorm(tf: Int, dl: Long, avgdl: Double): Double =
    tf / (tf + K1 * (1.0 - B + B * dl / avgdl))

  def contribution(idfT: Double, tf: Int, dl: Long, avgdl: Double): Double =
    idfT * tfNorm(tf, dl, avgdl)
}

/** Broadcast-able query model: terms sorted (fixed summation order), idfs
  * aligned with terms, corpus avgdl, and k.
  */
final case class QueryModel(
    terms: Array[String],
    idfs: Array[Double],
    avgdl: Double,
    k: Int) {
  require(terms.length == idfs.length, "terms/idfs must align")
  def isEmpty: Boolean = terms.isEmpty
}

object QueryModel {
  /** Analyze a raw query string into unique sorted terms with idfs looked up
    * from `dfByTerm` (absent terms get df=0 → they still contribute idf but
    * match no docs, mirroring the brute-force/DuckDB oracles which simply
    * find no postings).
    */
  def build(rawTerms: Seq[String], nDocs: Long, dfByTerm: Map[String, Long],
      avgdl: Double, k: Int): QueryModel = {
    val uniq = rawTerms.flatMap(Analyzer.tokenize(_)).distinct.sorted.toArray
    val idfs = uniq.map(t => Bm25.idf(nDocs, dfByTerm.getOrElse(t, 0L)))
    QueryModel(uniq, idfs, avgdl, k)
  }
}
