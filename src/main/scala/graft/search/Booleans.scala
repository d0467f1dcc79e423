package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Blocks, Codec}
import graft.index.Indexer
import graft.io.Catalog
import graft.io.Catalog.IndexPaths

/** Boolean (unscored filter-context) set operations over the inverted index
  * (SURVEY.md §2 row 14; ES bool-query semantics).
  *
  * Posting blocks decode straight to docID sets; AND/NOT become
  * intersect/except over those sets. Only the `doc_deltas_vb` payload is
  * decoded — column pruning drops the tf/dl streams at the scan.
  */
object Booleans {

  /** DocIDs containing `term` — bucket-pruned, term-pushed-down scan. */
  def docsOf(spark: SparkSession, root: String, term: String): DataFrame = {
    import spark.implicits._
    val meta = Indexer.readMeta(spark, root)
    val b = Blocks.bucketOf(term, meta.buckets)
    spark.read.parquet(IndexPaths(root).postings)
      .filter($"bucket" === b && $"term" === term)
      .select($"n_docs", $"doc_deltas_vb")
      .as[(Int, Array[Byte])]
      .flatMap { case (n, deltas) => Codec.decodeDeltas(deltas, n) }
      .toDF("doc_id")
  }

  /** Docs containing ALL terms (conjunction): left-semi chain. */
  def and(spark: SparkSession, root: String, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty)
    import spark.implicits._
    terms.map(docsOf(spark, root, _))
      .reduce((a, b) => a.join(b, Seq("doc_id"), "left_semi"))
      .orderBy($"doc_id")
  }

  /** Docs containing `pos` but not `neg` (left-anti). */
  def andNot(spark: SparkSession, root: String, pos: String, neg: String): DataFrame = {
    import spark.implicits._
    docsOf(spark, root, pos)
      .join(docsOf(spark, root, neg), Seq("doc_id"), "left_anti")
      .orderBy($"doc_id")
  }
}
