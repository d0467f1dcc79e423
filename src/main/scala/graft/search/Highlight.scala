package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Analyzer, QueryModel}
import graft.io.Catalog

/** ES `highlight` analog: best-window snippets for the top-k hits of a BM25
  * query. Defined in ANALYZED-TOKEN space (the snippet is the `window`-token
  * span with the most query-term matches, ties to the earliest start; matched
  * tokens wrapped in `<em>…</em>`, tokens joined by single spaces) — token
  * space makes the semantics engine-portable, so the DuckDB oracle replays
  * it bit-for-bit, where ES's original-text offsets would not be.
  *
  * Scale shape: the expensive part is the WAND top-k; snippet extraction is
  * a typed per-row pass over exactly k hydrated rows (broadcast join), so
  * its cost is O(k · dl) regardless of corpus size.
  */
object Highlight {

  /** Best-window snippet for one analyzed doc. `terms` must be analyzed. */
  private[search] def snippet(text: String, terms: Set[String], window: Int): String = {
    val toks = Analyzer.tokenize(text)
    if (toks.isEmpty) return ""
    val w = math.min(window, toks.length)
    val hit = toks.map(terms.contains)
    // sliding match count; argmax with earliest-start tie-break
    var cur = 0
    var i = 0
    while (i < w) { if (hit(i)) cur += 1; i += 1 }
    var best = cur
    var bestStart = 0
    var s = 1
    while (s <= toks.length - w) {
      if (hit(s - 1)) cur -= 1
      if (hit(s + w - 1)) cur += 1
      if (cur > best) { best = cur; bestStart = s }
      s += 1
    }
    val sb = new StringBuilder
    i = bestStart
    while (i < bestStart + w) {
      if (i > bestStart) sb.append(' ')
      if (hit(i)) sb.append("<em>").append(toks(i)).append("</em>")
      else sb.append(toks(i))
      i += 1
    }
    sb.toString
  }

  /** Top-k BM25 hits with token-space snippets: (doc_id, score_r4, snippet).
    * `textTable`/`textCol` locate the original text (the `documents` table
    * for the driver corpus; an index's corpus_sorted works the same way).
    */
  def topKHighlighted(spark: SparkSession, root: String, sfDir: String,
      rawTerms: Seq[String], k: Int, window: Int = 8): DataFrame = {
    import spark.implicits._
    val terms = QueryModel.analyzedTerms(rawTerms).toSet
    val hits = SearchEngine.topKWand(spark, root, rawTerms, k)
    val docs = Catalog.readTable(spark, sfDir, "documents").select($"doc_id", $"text")
    broadcast(hits).join(docs, "doc_id")
      .select($"doc_id", $"score", $"text")
      .as[(Long, Double, String)]
      .map { case (d, sc, text) => (d, sc, snippet(text, terms, window)) }
      .toDF("doc_id", "score", "snippet")
      .select($"doc_id", round($"score", 4).as("score_r4"), $"snippet")
      .orderBy($"score_r4".desc, $"doc_id".asc)
  }
}
