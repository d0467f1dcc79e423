package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Catalog
import graft.io.Catalog.IndexPaths

/** ES `_stats` / `_cat/indices` analog: one-row description of an index.
  *
  * Two flavors: [[describe]] is the full operational view (includes
  * physical facts — block/run counts, tombstones, incremental flag — that
  * only the index knows); [[corpusFacts]] is the corpus-derivable subset
  * the DuckDB oracle can recompute from the raw table (the driver-gated
  * query).
  */
object IndexStats {

  /** Corpus-derivable statistics — oracle-checkable against the raw table:
    * doc count, token count, mean doc length, vocabulary size, and the
    * maximum document frequency (the head term's df).
    */
  def corpusFacts(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val paths = IndexPaths(root)
    val stats = Catalog.readCorpusStats(spark, paths)
    val dict = Catalog.readDictionary(spark, paths).toDF()
      .agg(count(lit(1)).as("n_terms"), coalesce(max($"df"), lit(0L)).as("max_df"))
      .head()
    Seq((stats.n_docs, stats.total_tokens, stats.avgdl,
        dict.getLong(0), dict.getLong(1)))
      .toDF("n_docs", "total_tokens", "avgdl", "n_terms", "max_df")
      .select($"n_docs", $"total_tokens", round($"avgdl", 6).as("avgdl_r6"),
        $"n_terms", $"max_df")
  }

  /** Full operational stats (physical layout + lifecycle state). */
  def describe(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val paths = IndexPaths(root)
    val meta = Indexer.readMeta(spark, root)
    val stats = Catalog.readCorpusStats(spark, paths)
    val phys = graft.io.Catalog.readParquet(spark, paths.postings)
      .agg(count(lit(1)).as("blocks"),
        approx_count_distinct(concat_ws("#", $"term", $"run_id")).as("runs"),
        sum($"n_docs").as("postings"))
      .head()
    val bytes = graft.io.Fs.listDataFiles(paths.postings).map(_._2).sum
    // distributed count — never collect the (potentially huge) tombstone set
    // to the driver just to measure it
    val tombstones =
      if (Deletes.hasDeletes(paths)) spark.read.parquet(paths.deletes).count()
      else 0L
    Seq((stats.n_docs, stats.total_tokens, stats.avgdl, meta.buckets,
        meta.doc_id_space, meta.incremental, phys.getLong(0), phys.getLong(1),
        phys.getLong(2), bytes, tombstones))
      .toDF("n_docs", "total_tokens", "avgdl", "buckets", "doc_id_space",
        "incremental", "blocks", "runs_approx", "postings", "postings_bytes",
        "tombstones")
  }
}
