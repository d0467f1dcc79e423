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

  @inline private def isTokenChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || (c >= 'A' && c <= 'Z') ||
      (c > 127 && Character.isLetterOrDigit(c))

  /** Scala-side tokenizer (used inside typed Dataset transforms).
    *
    * Allocation-light single scan (no regex, no whole-string lowercase copy):
    * at 10^12-turn scale the tokenizer dominates the build's allocation rate,
    * and GC becomes the scaling ceiling before CPU does. Semantics equal the
    * regex form (property-tested against it); the only divergence is exotic
    * Unicode (astral-plane letters, Nl/No numerals, locale-special casing),
    * which the pinned ASCII-equivalent analyzer explicitly scopes out
    * (SURVEY.md §1.4).
    */
  def tokenize(text: String): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty[String]
    val n = text.length
    val out = new scala.collection.mutable.ArrayBuffer[String](16)
    var i = 0
    while (i < n) {
      // skip separators
      while (i < n && !isTokenChar(text.charAt(i))) i += 1
      if (i < n) {
        val start = i
        var needsLower = false
        while (i < n && isTokenChar(text.charAt(i))) {
          val c = text.charAt(i)
          if (c >= 'A' && c <= 'Z') needsLower = true
          else if (c > 127 && Character.toLowerCase(c) != c) needsLower = true
          i += 1
        }
        val raw = text.substring(start, i)
        out += (if (needsLower) raw.toLowerCase(Locale.ROOT) else raw)
      }
    }
    out.toArray
  }

  /** Catalyst Column form: array of non-empty tokens. Codegen'd built-ins
    * only (split/lower/filter) — no UDF, so Catalyst can still push filters
    * around it and the expression stays inside WholeStageCodegen.
    */
  def tokensCol(text: Column): Column =
    filter(split(lower(text), TokenSplitRegex), t => t =!= lit(""))

  /** DuckDB-side equivalent (kept here so oracle SQL builders share it). */
  def duckdbTokensExpr(textExpr: String): String =
    s"list_filter(regexp_split_to_array(lower($textExpr), '[^a-z0-9]+'), t -> t <> '')"
}
