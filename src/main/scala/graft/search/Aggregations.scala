package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Analyzer
import graft.io.Catalog
import graft.io.Catalog.IndexPaths

/** ES search aggregations beyond the flat facet/date-histogram set:
  * `significant_terms` and `top_hits`.
  */
object Aggregations {

  /** ES `significant_terms` with the default JLH heuristic: terms
    * overrepresented in the docs matching `fgTerm` (the foreground) relative
    * to the whole index (the background).
    *
    *   jlh = (fgPct − bgPct) · (fgPct / bgPct),  kept only where fgPct > bgPct
    *
    * Background df comes from the index DICTIONARY (no corpus pass);
    * foreground df is one narrow tokenize pass over the matched docs only
    * (left-semi join against the postings-derived doc set — the same shape
    * as ES collecting the agg over the hit set). Foreground size is the one
    * driver-side scalar.
    */
  def significantTerms(spark: SparkSession, root: String, sfDir: String,
      fgTerm: String, topN: Int): DataFrame = {
    import spark.implicits._
    val paths = IndexPaths(root)
    val fg = Booleans.docsOf(spark, root, fgTerm)
    val fgSize = fg.count()
    if (fgSize == 0) return spark.emptyDataset[(String, Double)].toDF("term", "jlh_r6")
    val nDocs = Catalog.readCorpusStats(spark, paths).n_docs

    val fgDf = Catalog.readDocuments(spark, sfDir)
      .join(fg, Seq("doc_id"), "left_semi")
      .select(explode(array_distinct(Analyzer.tokensCol($"text"))).as("term"))
      .groupBy($"term").agg(count(lit(1)).as("fg_df"))

    val bgDf = Catalog.readDictionary(spark, paths).toDF().select($"term", $"df")

    val fgPct = $"fg_df".cast("double") / fgSize.toDouble
    val bgPct = $"df".cast("double") / nDocs.toDouble
    fgDf.join(bgDf, "term")
      .filter(fgPct > bgPct)
      .withColumn("jlh", (fgPct - bgPct) * (fgPct / bgPct))
      .orderBy($"jlh".desc, $"term".asc)
      .limit(topN)
      .select($"term", round($"jlh", 6).as("jlh_r6"))
  }

  /** ES `collapse`: one best hit per `source` value — top_hits with bucket
    * size 1, flattened (the result dedupes on the collapse field, ranked by
    * the collapsed hits' scores).
    */
  def collapseBySource(spark: SparkSession, root: String, sfDir: String,
      rawTerms: Seq[String], k: Int): DataFrame = {
    import spark.implicits._
    topHitsByFacet(spark, root, sfDir, rawTerms, 1)
      .select($"source", $"doc_id", $"score_r4")
      .orderBy($"score_r4".desc, $"doc_id".asc)
      .limit(k)
  }

  /** ES `top_hits` under a terms aggregation: the best `perBucket` hits of
    * the query per `source` facet, ranked (score DESC, doc_id ASC) within
    * each bucket. Scores EVERY matching doc — the same cost ES pays:
    * aggregations consume the full hit stream, and WAND skipping is
    * impossible without a per-bucket threshold (any doc can be the best of
    * a bucket nothing else matched). The per-bucket cut is a partitioned
    * window over the scored matches — Spark's TakeOrdered-per-group; scores
    * round to 4dp BEFORE ranking so the bucket ranks are engine-portable
    * (the global top-k paths tie-break on exact doubles instead, both
    * engines summing identically).
    */
  def topHitsByFacet(spark: SparkSession, root: String, sfDir: String,
      rawTerms: Seq[String], perBucket: Int): DataFrame = {
    import spark.implicits._
    val scored = SearchEngine.scoreAllDocs(spark, root, rawTerms)
      .select($"doc_id", round($"score", 4).as("score_r4"))
    val docs = Catalog.readTable(spark, sfDir, "documents")
      .select($"doc_id", $"source")
    val w = Window.partitionBy($"source")
      .orderBy($"score_r4".desc, $"doc_id".asc)
    scored.join(docs, "doc_id")
      .withColumn("bucket_rank", row_number().over(w))
      .filter($"bucket_rank" <= perBucket)
      .select($"source", $"bucket_rank", $"doc_id", $"score_r4")
      .orderBy($"source", $"bucket_rank")
  }
}
