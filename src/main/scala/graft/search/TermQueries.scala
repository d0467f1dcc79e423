package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Codec
import graft.io.Catalog
import graft.io.Catalog.IndexPaths

/** Term-expansion queries over the inverted index — the ES `prefix` and
  * `fuzzy` query analogs (unscored filter context, like Booleans).
  */
object TermQueries {

  /** ES prefix query: docs containing any indexed term with the prefix.
    * A prefix does not determine the hash bucket, so this is one postings
    * scan across buckets with the StartsWith predicate pushed to Parquet
    * (term-sorted row groups make the min/max stats selective); only the
    * docID payload is read.
    */
  def prefix(spark: SparkSession, root: String, p: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(IndexPaths(root).postings)
      .filter($"term".startsWith(p))
      .select($"n_docs", $"doc_deltas_vb")
      .as[(Int, Array[Byte])]
      .flatMap { case (n, deltas) => Codec.decodeDeltas(deltas, n) }
      .toDF("doc_id")
      .distinct()
      .orderBy($"doc_id")
  }

  /** ES fuzzy query: dictionary term expansion within `maxDist` edits
    * (capped at `maxExpansions`, term-ordered — ES's max_expansions), then
    * a bucket-pruned disjunction over the expanded terms. The dictionary is
    * tiny relative to the corpus, exactly why ES does expansion there too.
    */
  def fuzzy(spark: SparkSession, root: String, term: String,
      maxDist: Int = 1, maxExpansions: Int = 50): DataFrame = {
    import spark.implicits._
    val expanded = Catalog.readDictionary(spark, IndexPaths(root))
      .toDF()
      .filter(levenshtein($"term", lit(term)) <= maxDist)
      .orderBy($"term")
      .limit(maxExpansions)
      .collect().map(_.getString(0)).toSeq
    if (expanded.isEmpty)
      spark.emptyDataset[Long].toDF("doc_id")
    else Booleans.or(spark, root, expanded)
  }
}
