package graft.core

import java.util.Locale
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pinned text analyzer — the single source of truth for tokenization on
  * both the index and query paths (SURVEY.md §1.4).
  *
  * Semantics: lowercase, split on runs of non-letter/non-digit, drop empty
  * tokens. This is a documented simplification of the Elasticsearch
  * `standard` analyzer (UAX#29 + lowercase, no stopwords/stemming); on the
  * ASCII test corpora the two are identical.
  *
  * The same regex is used in three places and MUST stay in sync:
  *  - [[tokenize]] (Scala hot path, precompiled Pattern),
  *  - [[tokensCol]] (Catalyst Column form, whole-stage-codegen'd),
  *  - the DuckDB oracle SQL (`regexp_split_to_array(lower(text), ...)`).
  */
object Analyzer {

  /** Java & RE2-compatible: Unicode letter or digit complement. */
  val TokenSplitRegex = "[^\\p{L}\\p{N}]+"

  private val pattern = Pattern.compile(TokenSplitRegex)

  // ASCII-only: the fast scan below never sees non-ASCII (unicode falls
  // back to the regex pipeline before this is consulted)
  @inline private def isTokenChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || (c >= 'A' && c <= 'Z')

  /** Scala-side tokenizer (used inside typed Dataset transforms).
    *
    * Pure-ASCII text (the overwhelming common case for code/agent
    * transcripts) takes an allocation-light single scan — no regex, no
    * whole-string lowercase copy: at 10^12-turn scale the tokenizer
    * dominates the build's allocation rate, and GC becomes the scaling
    * ceiling before CPU does.
    *
    * Any non-ASCII char falls back to EXACTLY the Column form's pipeline —
    * `toLowerCase(Locale.ROOT)` on the whole string (the same Java full
    * case mapping Spark's `lower()` applies, including the context-
    * sensitive final-sigma and dotted-İ rules), then the same \p{L}\p{N}
    * regex split — so the typed index path and the Column query path can
    * never disagree on ANY input (AnalyzerProps pins this over unicode
    * generators; r2's split-then-lower fast path produced a different
    * İstanbul tokenization than the Column form).
    */
  def tokenize(text: String): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty[String]
    val n = text.length
    // single pass: the first non-ASCII char encountered mid-scan discards
    // the partial output and falls back to the regex pipeline (was: a
    // whole-string ASCII pre-scan — a second full char read on the path
    // that dominates the build's CPU at scale)
    val out = new scala.collection.mutable.ArrayBuffer[String](16)
    var i = 0
    while (i < n) {
      // skip ASCII separators; stop at token chars AND at non-ASCII
      while (i < n && { val c = text.charAt(i); c <= 127 && !isTokenChar(c) }) i += 1
      if (i < n) {
        // Non-ASCII: exact Column-form semantics. Spark's lower() routes
        // full-ASCII strings through an ASCII mapping (our fast path) but
        // MIXED strings through String.toLowerCase() with the DEFAULT JVM
        // locale (UTF8String.toLowerCaseSlow) — so the fallback must use
        // the default locale too, or a tr/az/lt-locale JVM would tokenize
        // I/İ differently in the two paths (ADVICE r3). Cross-JVM-locale
        // index portability carries the same caveat Spark itself has;
        // pin -Duser.language on heterogeneous clusters.
        if (text.charAt(i) > 127)
          return pattern.split(text.toLowerCase()).filter(_.nonEmpty)
        val start = i
        var needsLower = false
        while (i < n && isTokenChar(text.charAt(i))) {
          val c = text.charAt(i)
          if (c >= 'A' && c <= 'Z') needsLower = true
          i += 1
        }
        val raw = text.substring(start, i)
        out += (if (needsLower) raw.toLowerCase(Locale.ROOT) else raw)
      }
    }
    out.toArray
  }

  /** Named-analyzer dispatch (ES: every index pins its analyzer; query-time
    * analysis MUST match index-time or scores are meaningless — the name is
    * recorded in IndexMeta and threaded back through the query paths).
    *  - "standard": the pinned [[tokenize]];
    *  - "english": [[tokenize]] then Lucene's classic stopword removal and
    *    Porter stemming ([[En.analyze]]).
    */
  def analyze(text: String, analyzer: String): Array[String] = analyzer match {
    case "standard" => tokenize(text)
    case "english" => En.analyze(tokenize(text))
    // ES search_as_you_type index side: each token expands to its leading
    // edge n-grams (min 2, max 5; tokens shorter than min are dropped).
    // dl/avgdl count GRAMS — the gram field has its own stats, as in ES.
    case "edge_ngram" => tokenize(text).flatMap { t =>
      (EdgeMin to math.min(t.length, EdgeMax)).map(t.substring(0, _))
    }
    // SEARCH side of an edge_ngram index: standard tokenization, each term
    // truncated to the longest stored gram (EdgeMax) — a query term longer
    // than EdgeMax matches via its EdgeMax-prefix gram, the closest public
    // analog of ES's prefix behavior on search_as_you_type (ADVICE r5: the
    // plain `standard` search form silently matched NOTHING past EdgeMax).
    // DOCUMENTED DIVERGENCE (ADVICE r6): the truncation OVER-matches vs ES
    // for terms past EdgeMax — "windowing" matches any doc whose token
    // starts with its EdgeMax prefix ("windo…"), where real
    // search_as_you_type falls back to full-term matching on the root
    // field. Engine and oracle share the truncation, so the harness is
    // self-consistent; a root-field fallback is the faithful upgrade.
    case "edge_search" => tokenize(text).map(t =>
      if (t.length > EdgeMax) t.substring(0, EdgeMax) else t)
    case other => throw new IllegalArgumentException(s"unknown analyzer: $other")
  }

  /** Edge-ngram bounds (ES search_as_you_type defaults its gram subfields
    * to 2..3/4; 2..5 covers the corpus's prefix-query range).
    */
  val EdgeMin = 2
  val EdgeMax = 5

  /** Query-side analyzer for an index analyzer — identity except
    * `edge_ngram`, where ES's own convention applies: search_as_you_type
    * indexes with the gram analyzer but SEARCHES with the plain token
    * (the typed prefix is matched against the stored grams as-is;
    * expanding the query into its own grams would conjunct every shorter
    * prefix), truncated to EdgeMax so over-long terms still match their
    * longest stored gram ([[analyze]]'s `edge_search` case).
    */
  def searchForm(analyzer: String): String =
    if (analyzer == "edge_ngram") "edge_search" else analyzer

  /** [[analyze]] + an index-time synonym CONTRACTION map (Lucene
    * `a,b => a` form) applied after the base chain: every token is replaced
    * by its canonical group member, so postings/df/cf/stats all reflect the
    * merged group — the half of the ES synonym story query-time
    * SynonymQuery cannot express (it blends df at query time; this bakes
    * the union df into the index). Token count is preserved (dl unchanged).
    */
  def analyze(text: String, analyzer: String,
      synonyms: Map[String, String]): Array[String] = {
    val toks = analyze(text, analyzer)
    if (synonyms.isEmpty) toks
    else {
      var i = 0
      while (i < toks.length) {
        val c = synonyms.getOrElse(toks(i), null)
        if (c != null) toks(i) = c
        i += 1
      }
      toks
    }
  }

  /** Catalyst Column form: array of non-empty tokens. Codegen'd built-ins
    * only (split/lower/filter) — no UDF, so Catalyst can still push filters
    * around it and the expression stays inside WholeStageCodegen.
    */
  def tokensCol(text: Column): Column =
    filter(split(lower(text), TokenSplitRegex), t => t =!= lit(""))

  /** DuckDB-side equivalent (kept here so oracle SQL builders share it).
    * RE2 supports the same \p{L}\p{N} classes and DuckDB `lower` is
    * unicode-aware, so the oracle now tokenizes non-ASCII text (Greek,
    * Cyrillic, CJK, accented Latin, non-ASCII digits) identically to the
    * engine — the r2 twin treated EVERY non-ASCII char as a separator.
    * Known residual divergence, validated by tools/analyzer_parity.py:
    * DuckDB lower() applies the SIMPLE case mapping where Java applies the
    * SpecialCasing contextual rules — exactly two codepoint families
    * differ: U+0130 İ (Java → i+U+0307, DuckDB → i) and final-position
    * Σ (Java → ς, DuckDB → σ). Documented out of oracle scope; the engine
    * itself is internally consistent on them (typed ≡ Column, pinned by
    * AnalyzerProps).
    */
  def duckdbTokensExpr(textExpr: String): String =
    s"""list_filter(regexp_split_to_array(lower($textExpr), '[^\\p{L}\\p{N}]+'), t -> t <> '')"""
}
