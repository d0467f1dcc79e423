package graft

/** DuckDB ANSI-SQL oracle builders (SparkEntry.oracleSql values).
  *
  * These must be semantically identical to the Spark implementations; the
  * driver replays them in DuckDB 1.0 over the same parquet tables and
  * compares results (SURVEY.md §5.1). The tokenizer expression is the
  * DuckDB twin of graft.core.Analyzer (validated rank+score-identical
  * pre-build, SURVEY.md §0.2).
  */
object OracleSql {

  /** DuckDB token-array expression over a text column. */
  def toks(expr: String): String =
    s"list_filter(regexp_split_to_array(lower($expr), '[^a-z0-9]+'), t -> t <> '')"

  private def inList(terms: Seq[String]): String =
    terms.map(t => s"'$t'").mkString("(", ", ", ")")

  /** Full BM25 top-k CTE pipeline over `documents` (k1=1.2, b=0.75, Lucene
    * idf, ties (score DESC, doc_id ASC)); scores rounded to 4 decimals to be
    * hash-stable across engines.
    */
  def bm25TopK(terms: Seq[String], k: Int): String = {
    val t = terms.flatMap(graft.core.Analyzer.tokenize(_)).distinct.sorted
    s"""WITH dls AS (
       |  SELECT doc_id, len(${toks("text")}) AS dl FROM documents
       |), stats AS (
       |  SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dls
       |), tok AS (
       |  SELECT doc_id, unnest(${toks("text")}) AS term FROM documents
       |), tf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM tok
       |  WHERE term IN ${inList(t)} GROUP BY doc_id, term
       |), dfs AS (
       |  SELECT term, count(*) AS df FROM tf GROUP BY term
       |), contrib AS (
       |  SELECT tf.doc_id,
       |         ln(1 + (stats.n_docs - dfs.df + 0.5) / (dfs.df + 0.5)) *
       |         (tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dls.dl / stats.avgdl))) AS c
       |  FROM tf
       |  JOIN dfs USING (term)
       |  JOIN dls USING (doc_id)
       |  CROSS JOIN stats
       |)
       |SELECT doc_id, round(sum(c), 4) AS score_r4
       |FROM contrib GROUP BY doc_id
       |ORDER BY sum(c) DESC, doc_id ASC LIMIT $k""".stripMargin
  }

  /** Unscored boolean AND over `documents`: docs containing all terms. */
  def boolAnd(terms: Seq[String]): String = {
    val sets = terms.map(t =>
      s"SELECT DISTINCT doc_id FROM (SELECT doc_id, unnest(${toks("text")}) AS term FROM documents) WHERE term = '$t'")
    sets.mkString("", "\nINTERSECT\n", "\nORDER BY doc_id")
  }

  /** Boolean AND NOT: docs containing `pos` but not `neg`. */
  def boolAndNot(pos: String, neg: String): String =
    s"""SELECT DISTINCT doc_id FROM (SELECT doc_id, unnest(${toks("text")}) AS term FROM documents) WHERE term = '$pos'
       |EXCEPT
       |SELECT DISTINCT doc_id FROM (SELECT doc_id, unnest(${toks("text")}) AS term FROM documents) WHERE term = '$neg'
       |ORDER BY doc_id""".stripMargin

  /** Per-term df/cf (dictionary twin). */
  val termStats: String =
    s"""SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf FROM (
       |  SELECT doc_id, term, count(*) AS tf
       |  FROM (SELECT doc_id, unnest(${toks("text")}) AS term FROM documents)
       |  GROUP BY doc_id, term
       |) GROUP BY term ORDER BY term""".stripMargin

  /** Corpus stats (N, total tokens, avgdl rounded). */
  val corpusStats: String =
    s"""SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_tokens, round(avg(dl), 6) AS avgdl_r6
       |FROM (SELECT doc_id, len(${toks("text")}) AS dl FROM documents)""".stripMargin

  /** Flat term-frequency table (tf extraction twin). */
  val termFreqs: String =
    s"""SELECT doc_id, term, count(*) AS tf
       |FROM (SELECT doc_id, unnest(${toks("text")}) AS term FROM documents)
       |GROUP BY doc_id, term ORDER BY doc_id, term""".stripMargin

  /** Dense docID assignment demo over documents (stable order by source, doc_id). */
  val denseIds: String =
    """SELECT CAST(row_number() OVER (ORDER BY source, doc_id) - 1 AS BIGINT) AS rid,
      |       doc_id, source
      |FROM documents ORDER BY rid""".stripMargin
}
