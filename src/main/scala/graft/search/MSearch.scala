package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Blocks, QueryModel}
import graft.index.Indexer
import graft.io.Catalog
import graft.io.Catalog.IndexPaths

/** ES `_msearch`: a BATCH of queries answered in one index pass.
  *
  * ES's msearch is a transport-level batching (each sub-search still runs
  * its own scan per shard). On Spark the batch can share real work: one
  * bucket-pruned, term-pushed-down postings scan for the UNION of all
  * queries' terms, one docID-range shard exchange, and then — inside each
  * shard task — an independent Block-Max WAND pass per query over that
  * shard's already-fetched blocks. Q queries cost one scan + one shuffle
  * instead of Q of each; the per-query WAND passes reuse the same decoded
  * term→blocks map and skip blocks exactly as the single-query path does
  * (fresh cursors per query keep the rank-safety argument of
  * [[Wand.scoreShard]] untouched).
  *
  * At 100 TB this is the query-serving shape for offline batch scoring
  * (relevance eval sets, percolate-style routing, training-label
  * generation): amortizing the scan across queries is the difference
  * between O(Q) corpus passes and O(1).
  *
  * Per-query top-k: each shard emits ≤ k candidates per query, so the
  * final cut ranks ≤ shards·k rows per query — the window below runs on
  * that tiny candidate set (partitioned by query_id, never corpus-sized).
  */
object MSearch {

  /** Run `queries` (id → raw terms) as one batch; returns one row per
    * (query_id, hit) with rounded scores, top-k per query.
    */
  def msearch(spark: SparkSession, root: String,
      queries: Seq[(String, Seq[String])], k: Int,
      shardsOpt: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val paths = IndexPaths(root)
    val meta = Indexer.readMeta(spark, root)
    val syn =
      if (meta.synonyms) Catalog.readSynonyms(spark, paths)
      else Map.empty[String, String]

    // one dictionary lookup for the union of all queries' analyzed terms
    val allTerms = queries
      .flatMap { case (_, raw) => QueryModel.analyzedTerms(raw, meta.analyzer, syn) }
      .distinct.sorted
    if (allTerms.isEmpty) return emptyResult(spark)
    val stats = Catalog.readCorpusStats(spark, paths)
    val dfByTerm = Catalog.readDictionary(spark, paths)
      .filter($"term".isin(allTerms: _*))
      .collect().map(d => d.term -> d.df).toMap
    val models: Seq[(String, QueryModel)] = queries.map { case (qid, raw) =>
      qid -> QueryModel.build(raw, stats.n_docs, dfByTerm, stats.avgdl, k,
        meta.analyzer, syn)
    }.filter(!_._2.isEmpty)
    if (models.isEmpty) return emptyResult(spark)
    val bcModels = spark.sparkContext.broadcast(models)

    val shards = shardsOpt.getOrElse(spark.sessionState.conf.numShufflePartitions)
    val width = math.max(1L, (meta.doc_id_space + shards - 1) / shards)
    val robust = meta.incremental
    val qBuckets = allTerms.map(Blocks.bucketOf(_, meta.buckets)).distinct

    val candidates = Catalog.readPostings(spark, paths)
      .filter($"bucket".isin(qBuckets: _*) && $"term".isin(allTerms: _*))
      .flatMap { b =>
        ((b.first_doc / width) to (b.last_doc / width)).iterator
          .map(s => (s.toInt, b))
      }
      .groupByKey(_._1)
      .flatMapGroups { (shard, it) =>
        val byTerm = it.map(_._2).toArray.groupBy(_.term)
        val lo = shard.toLong * width
        val hi = lo + width
        bcModels.value.iterator.flatMap { case (qid, qm) =>
          val cursors = Array.newBuilder[Wand.TermCursor]
          var ti = 0
          while (ti < qm.terms.length) {
            byTerm.get(qm.terms(ti)).foreach { bs =>
              cursors += new Wand.TermCursor(qm.idfs(ti), bs.sortBy(_.first_doc),
                qm.avgdl, hi, robust)
            }
            ti += 1
          }
          Wand.scoreShard(cursors.result(), lo, k)
            .iterator.map(h => (qid, h.doc_id, h.score))
        }
      }
      .toDF("query_id", "doc_id", "score")

    // ≤ shards·k rows per query reach this window — a candidate cut, not a
    // corpus-sized WindowExec
    val w = Window.partitionBy($"query_id")
      .orderBy($"score".desc, $"doc_id".asc)
    candidates
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= k)
      .select($"query_id", $"doc_id", round($"score", 4).as("score_r4"))
      .orderBy($"query_id".asc, $"score_r4".desc, $"doc_id".asc)
  }

  private def emptyResult(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.emptyDataset[(String, Long, Double)]
      .toDF("query_id", "doc_id", "score_r4")
  }
}
