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

  /** Scala-side tokenizer (used inside typed Dataset transforms). */
  def tokenize(text: String): Array[String] = {
    if (text == null || text.isEmpty) Array.empty[String]
    else {
      val toks = pattern.split(text.toLowerCase(Locale.ROOT))
      // Pattern.split yields a leading "" when the text starts with a
      // separator; trailing empties are already stripped by split.
      var n = 0
      var i = 0
      while (i < toks.length) { if (toks(i).nonEmpty) n += 1; i += 1 }
      if (n == toks.length) toks
      else {
        val out = new Array[String](n)
        var j = 0
        i = 0
        while (i < toks.length) {
          if (toks(i).nonEmpty) { out(j) = toks(i); j += 1 }
          i += 1
        }
        out
      }
    }
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
