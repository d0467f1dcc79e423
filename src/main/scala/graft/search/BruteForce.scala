package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.{Analyzer, Bm25}

/** Exact brute-force BM25 scorer — the index-free oracle twin (SURVEY.md §2
  * row 16). Pure DataFrame/Column expressions mirroring the DuckDB oracle SQL
  * CTE-for-CTE, so Catalyst keeps the whole plan in WholeStageCodegen: no
  * UDFs, no typed lambdas. Used to shadow the index path in tests and as the
  * driver-facing reference implementation.
  */
object BruteForce {

  /** Top-k over a (doc_id, text) DataFrame for the analyzed `terms`.
    * Output: (doc_id, score) ordered (score DESC, doc_id ASC), k rows.
    */
  def topK(docs: DataFrame, rawTerms: Seq[String], k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // no ensureParallelism: the tokenized frame feeds several independent
    // aggregation subtrees whose single-task stages the scheduler overlaps;
    // a repartition per subtree measured slower on the driver bench
    scoreToks(docs.select($"doc_id", Analyzer.tokensCol($"text").as("toks")),
      rawTerms.flatMap(Analyzer.tokenize(_)).distinct.sorted, k)
  }

  /** Analyzer-aware twin: tokens via the named analysis chain (a typed map —
    * stemming has no Column form), then the identical scoring pipeline.
    * Shadow/oracle machinery, not a production path.
    */
  def topKAnalyzed(docs: DataFrame, rawTerms: Seq[String], k: Int,
      analyzer: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select($"doc_id", $"text").as[(Long, String)]
      .map { case (id, t) => (id, Analyzer.analyze(t, analyzer)) }
      .toDF("doc_id", "toks")
    scoreToks(toks,
      rawTerms.flatMap(Analyzer.analyze(_, analyzer)).distinct.sorted, k)
  }

  /** Shared scoring pipeline over a (doc_id, toks) frame — mirrors the
    * DuckDB oracle CTE-for-CTE.
    */
  private def scoreToks(toksDf: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    val spark = toksDf.sparkSession
    import spark.implicits._
    val docs = toksDf
    val dls = docs.select($"doc_id", size($"toks").as("dl"))
    val stats = dls.agg(
      count(lit(1)).as("n_docs"),
      avg($"dl").as("avgdl"))

    val tf = docs
      .select($"doc_id", explode($"toks").as("term"))
      .filter($"term".isin(terms: _*))
      .groupBy($"doc_id", $"term")
      .agg(count(lit(1)).as("tf"))

    val dfs = tf.groupBy($"term").agg(count(lit(1)).as("df"))

    val contrib = tf
      .join(dfs, "term")
      .join(dls, "doc_id")
      .crossJoin(stats)
      .select($"doc_id",
        (log(lit(1.0) + (($"n_docs" - $"df" + lit(0.5)) / ($"df" + lit(0.5)))) *
          ($"tf" / ($"tf" + lit(Bm25.K1) * (lit(1.0 - Bm25.B) + lit(Bm25.B) * $"dl" / $"avgdl"))))
          .as("c"))

    contrib
      .groupBy($"doc_id")
      .agg(sum($"c").as("score"))
      .orderBy($"score".desc, $"doc_id".asc)
      .limit(k)
  }

  /** Driver-contract shape: doc_id + score rounded to 4 decimals (floats are
    * not hash-stable across engines; the oracle SQL rounds identically).
    */
  def topKRounded(docs: DataFrame, rawTerms: Seq[String], k: Int): DataFrame = {
    import docs.sparkSession.implicits._
    topK(docs, rawTerms, k).select($"doc_id", round($"score", 4).as("score_r4"))
  }
}
