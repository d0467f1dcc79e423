package graft.search

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Analyzer
import graft.io.Catalog

/** ES percolator: reverse search — stored queries, incoming documents.
  *
  * A registered query is (query_id, analyzed terms, minimum_should_match);
  * percolating a document returns every stored query it satisfies (distinct
  * matched terms ≥ mm; mm = #terms is the conjunction form).
  *
  * Scale shape is Lucene's own percolator design inverted onto Spark: the
  * QUERY set (alert rules — thousands to millions of tiny rows) is compiled
  * into an in-memory term → [(query, needed)] map and broadcast; documents
  * — the 100 TB side — stream through one narrow tokenize pass with a
  * per-doc candidate lookup, no shuffle, no join. Complexity per doc is
  * O(distinct tokens ∩ query vocabulary), independent of corpus size; the
  * same function body serves batch and Structured Streaming micro-batches
  * ([[percolateTurns]]).
  */
object Percolator {

  /** A stored query: raw terms are analyzed at registration (ES percolator
    * analyzes stored queries with the index analyzer).
    */
  final case class StoredQuery(query_id: Long, rawTerms: Seq[String], minMatch: Int) {
    val terms: Array[String] =
      rawTerms.flatMap(t => Analyzer.tokenize(t)).distinct.sorted.toArray
  }

  /** Compiled broadcastable form: term → (query index, its id, its mm). */
  private[search] def compile(stored: Seq[StoredQuery])
      : (Map[String, Array[Int]], Array[Long], Array[Int]) = {
    val ids = stored.map(_.query_id).toArray
    val mms = stored.map(_.minMatch).toArray
    val byTerm = stored.zipWithIndex
      .flatMap { case (q, i) => q.terms.map(_ -> i) }
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).toArray }
    (byTerm, ids, mms)
  }

  /** The streaming-safe core: one narrow pass, emits (doc_id, query_id) for
    * every satisfied stored query. Works unchanged on batch and streaming
    * Datasets (no sort, no shuffle — flatMap only).
    */
  def percolateCore(docs: Dataset[(Long, String)],
      stored: Seq[StoredQuery]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(compile(stored))
    docs
      .flatMap { case (docId, text) =>
        val (byTerm, ids, mms) = bc.value
        val counts = new Array[Int](ids.length)
        val it = Analyzer.tokenize(text).distinct.iterator
        while (it.hasNext) {
          byTerm.get(it.next()).foreach { qs =>
            var i = 0
            while (i < qs.length) { counts(qs(i)) += 1; i += 1 }
          }
        }
        (0 until ids.length).iterator
          .filter(i => counts(i) >= mms(i))
          .map(i => (docId, ids(i)))
      }
      .toDF("doc_id", "query_id")
  }

  /** Batch form with the driver-contract ordering. */
  def percolate(docs: Dataset[(Long, String)], stored: Seq[StoredQuery]): DataFrame = {
    import docs.sparkSession.implicits._
    percolateCore(docs, stored).orderBy($"doc_id", $"query_id")
  }

  /** Structured Streaming form: percolate a document stream (ES alerting —
    * each arriving doc is matched against the registered queries). Same
    * core, per-micro-batch, no state.
    */
  def percolateStream(spark: SparkSession, inputDir: String,
      schema: org.apache.spark.sql.types.StructType,
      stored: Seq[StoredQuery]): DataFrame = {
    import spark.implicits._
    percolateCore(
      spark.readStream.schema(schema).parquet(inputDir)
        .select($"doc_id", $"text").as[(Long, String)],
      stored)
  }

  /** Percolate the documents table of an sfDir (the driver-query form). */
  def percolateTable(spark: SparkSession, sfDir: String,
      stored: Seq[StoredQuery]): DataFrame = {
    import spark.implicits._
    percolate(
      Catalog.readTable(spark, sfDir, "documents")
        .select($"doc_id", $"text").as[(Long, String)],
      stored)
  }

  /** The fixed registered-query set the driver query + oracle share. */
  val DriverQueries: Seq[StoredQuery] = Seq(
    StoredQuery(0L, Seq("join", "hash"), 2),           // conjunction
    StoredQuery(1L, Seq("window", "stream"), 1),       // disjunction
    StoredQuery(2L, Seq("vector", "index", "scan"), 2), // 2-of-3
    StoredQuery(3L, Seq("zebra"), 1))                  // never matches
}
