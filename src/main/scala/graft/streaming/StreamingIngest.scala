package graft.streaming

import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.index._
import graft.io.Catalog
import graft.io.Catalog.IndexPaths
import graft.model._

/** Incremental (streaming) index ingest (SURVEY.md §2 row 23): new turns
  * arrive as a stream; each micro-batch builds a delta segment appended to
  * the same postings layout.
  *
  * Why appending Just Works: docIDs continue monotonically from the previous
  * `doc_id_space`, so a new segment's runs cover docID ranges strictly above
  * every older segment's — per-term block lists stay disjoint and ordered by
  * `first_doc`, exactly the invariant WAND cursors need. No compaction is
  * required for correctness (it remains an optimization).
  *
  * BM25 under a growing corpus: avgdl drifts, so older blocks' stored
  * `max_tf_norm` (computed against the build-time avgdl) would under-estimate
  * — queries over streaming indexes therefore use the robust WAND bounds
  * recomputed from (max_tf, min_dl) against the current avgdl
  * (Wand.TermCursor(robustBounds = true)); exact scoring always uses the
  * current avgdl since blocks carry (tf, dl).
  */
object StreamingIngest {

  /** Ingest one micro-batch: assign continued docIDs, build a delta segment,
    * refresh stats/dictionary/meta. Returns the new corpus stats.
    *
    * `batchId` ≥ 0 makes the append idempotent under streaming replay: the
    * id is committed inside the SAME atomic meta swap as the segment, so a
    * micro-batch replayed after a driver failure between the meta swap and
    * the streaming checkpoint commit is detected (meta.last_batch_id ≥
    * batchId) and skipped instead of double-appended under fresh docIDs.
    * (A crash BEFORE the meta swap replays a partially-appended segment's
    * postings files — Overwrite-staged swaps cover dictionary/stats/meta,
    * and the postings append itself is the remaining non-transactional
    * window, disclosed; an Iceberg sink closes it with a real snapshot
    * commit.)
    */
  def ingestBatch(batch: Dataset[Turn], root: String, buckets: Int,
      targetRun: Long, batchId: Long = -1L): CorpusStats = {
    val spark = batch.sparkSession
    import spark.implicits._
    val paths = IndexPaths(root)
    val exists = graft.io.Fs.exists(paths.meta)
    val (off, n0, tot0, last0) =
      if (exists) {
        val m = Indexer.readMeta(spark, root)
        if (batchId >= 0 && m.last_batch_id >= batchId)
          return Catalog.readCorpusStats(spark, paths) // replayed batch: no-op
        val s = Catalog.readCorpusStats(spark, paths)
        (m.doc_id_space, s.n_docs, s.total_tokens, m.last_batch_id)
      } else (0L, 0L, 0L, -1L)

    val parts = spark.sessionState.conf.numShufflePartitions
    // batch stats ride the docID assignment's own passes — no extra scan
    val (assigned, batchStats) = DocIds.assignWithStats(batch, parts)
    val numbered = assigned
      .map(t => NumberedTurn(t.doc_id + off, t.conv_id, t.turn_idx, t.role, t.text, t.tool, t.ts))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val docs = numbered.map(t => Doc(t.doc_id, t.text))
    val nNew = n0 + batchStats.n_docs
    val totNew = tot0 + batchStats.total_tokens
    val avgdlNew = if (nNew == 0) 0.0 else totNew.toDouble / nNew

    val tf = TermFreqs.fromDocs(docs).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tstats = TermFreqs.termStats(tf)
    val heavy = SaltPlan.heavyTerms(tstats, targetRun)
    // batch-local salt range: the segment's doc_ids live in [off, off+n)
    val salted = SaltPlan.saltRange(tf, heavy, off, off + batchStats.n_docs)
    val blocks = Spimi.buildBlocks(salted, avgdlNew, buckets, parts)

    // append the delta segment
    blocks
      .sortWithinPartitions($"bucket", $"term", $"run_id", $"block_idx")
      .write.mode(SaveMode.Append).partitionBy("bucket").parquet(paths.postings)
    numbered.write.mode(SaveMode.Append).parquet(paths.corpusSorted)
    DocIds.toDocidMap(numbered).write.mode(SaveMode.Append).parquet(paths.docidMap)
    tstats.write.mode(SaveMode.Append).parquet(paths.termStats)
    tf.unpersist(blocking = false)
    numbered.unpersist(blocking = false)

    // refresh merged dictionary (df/cf additive over segments; max_tf_norm
    // from a payload-pruned metadata scan)
    val mergedStats = spark.read.parquet(paths.termStats)
      .groupBy($"term").agg(sum($"df").as("df"), sum($"cf").as("cf"))
    val blockAgg = spark.read.parquet(paths.postings)
      .groupBy($"term").agg(max($"max_tf_norm").as("max_tf_norm"))
    mergedStats.join(blockAgg, Seq("term"))
      .select($"term", $"df", $"cf", $"max_tf_norm").as[DictEntry]
      .write.mode(SaveMode.Overwrite).parquet(s"${paths.dictionaryBase}_staging")
    graft.io.Fs.publishVersion(paths.dictionaryBase, s"${paths.dictionaryBase}_staging")

    val stats = CorpusStats(nNew, totNew, avgdlNew)
    Seq(stats).toDS().write.mode(SaveMode.Overwrite)
      .parquet(s"${paths.corpusStatsBase}_staging")
    graft.io.Fs.publishVersion(paths.corpusStatsBase, s"${paths.corpusStatsBase}_staging")
    // meta LAST (readers read it first — same ordering invariant as
    // Compaction.compact) and carrying the batch idempotency cursor
    Seq(IndexMeta(buckets, targetRun, off + batchStats.n_docs,
        incremental = true, last_batch_id = math.max(batchId, last0)))
      .toDS().write.mode(SaveMode.Overwrite).parquet(s"${paths.metaBase}_staging")
    graft.io.Fs.publishVersion(paths.metaBase, s"${paths.metaBase}_staging")
    stats
  }

  /** Structured Streaming entry: watch a directory of turn parquet files and
    * index each micro-batch incrementally. `compactEvery` > 0 runs segment
    * compaction (index.Compaction) after every N batches, bounding file and
    * run counts over a long-running stream.
    */
  def start(spark: SparkSession, inputDir: String, root: String,
      checkpoint: String, buckets: Int = 8, targetRun: Long = 1 << 16,
      compactEvery: Int = 0): StreamingQuery = {
    import spark.implicits._
    val schema = org.apache.spark.sql.Encoders.product[Turn].schema
    var batches = 0L
    spark.readStream
      .schema(schema)
      .parquet(inputDir)
      .as[Turn]
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Turn], batchId: Long) =>
        ingestBatch(batch, root, buckets, targetRun, batchId)
        batches += 1
        if (compactEvery > 0 && batches % compactEvery == 0)
          Compaction.compact(spark, root)
      }
      .start()
  }
}
