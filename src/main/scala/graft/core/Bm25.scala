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

  /** ES `term^2.5` boost syntax → (raw term, weight). No suffix (or a
    * malformed one) means weight 1.0.
    */
  def parseBoost(raw: String): (String, Double) = {
    val i = raw.lastIndexOf('^')
    if (i > 0 && i < raw.length - 1)
      try {
        val w = raw.substring(i + 1).toDouble
        // a negative weight would flip idf's sign, turning every block-max
        // UPPER bound into a lower bound — WAND skips would be rank-unsafe.
        // ES rejects negative boosts for the same reason.
        require(w >= 0.0, s"negative boost not allowed: $raw")
        (raw.substring(0, i), w)
      }
      catch { case _: NumberFormatException => (raw, 1.0) }
    else (raw, 1.0)
  }

  /** Raw query strings (boost suffixes stripped) → analyzed unique terms.
    * `analyzer` must be the INDEX's analyzer (IndexMeta) — querying an
    * english-analyzed index with standard-analyzed terms would miss every
    * stemmed posting.
    */
  def analyzedTerms(rawTerms: Seq[String],
      analyzer: String = "standard",
      synonyms: Map[String, String] = Map.empty): Seq[String] =
    rawTerms.map(parseBoost(_)._1)
      .flatMap(Analyzer.analyze(_, analyzer, synonyms))
      .distinct.sorted

  /** Analyze raw query strings into unique sorted terms with idfs looked up
    * from `dfByTerm` (absent terms get df=0 → they still contribute idf but
    * match no docs, mirroring the brute-force/DuckDB oracles which simply
    * find no postings). Per-term boosts (`term^2.5`) multiply the idf —
    * weights therefore flow through every scorer AND every WAND bound
    * (bounds are linear in idf, so boosted skipping stays rank-safe). A
    * term boosted more than once keeps the max weight.
    */
  def build(rawTerms: Seq[String], nDocs: Long, dfByTerm: Map[String, Long],
      avgdl: Double, k: Int, analyzer: String = "standard",
      synonyms: Map[String, String] = Map.empty): QueryModel = {
    val weighted = rawTerms.map(parseBoost).flatMap { case (raw, w) =>
      Analyzer.analyze(raw, analyzer, synonyms).map(_ -> w)
    }
    val wByTerm = weighted.groupBy(_._1).map { case (t, ws) => t -> ws.map(_._2).max }
    val uniq = wByTerm.keys.toArray.sorted
    val idfs = uniq.map(t => Bm25.idf(nDocs, dfByTerm.getOrElse(t, 0L)) * wByTerm(t))
    QueryModel(uniq, idfs, avgdl, k)
  }
}
