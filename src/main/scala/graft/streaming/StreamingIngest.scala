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
    */
  def ingestBatch(batch: Dataset[Turn], root: String, buckets: Int,
      targetRun: Long): CorpusStats = {
    val spark = batch.sparkSession
    import spark.implicits._
    val paths = IndexPaths(root)
    val exists = graft.io.Fs.exists(s"$root/meta")
    val (off, n0, tot0) =
      if (exists) {
        val m = Indexer.readMeta(spark, root)
        val s = Catalog.readCorpusStats(spark, paths)
        (m.doc_id_space, s.n_docs, s.total_tokens)
      } else (0L, 0L, 0L)

    val parts = spark.sessionState.conf.numShufflePartitions
    val numbered = DocIds.assign(batch, parts)
      .map(t => NumberedTurn(t.doc_id + off, t.conv_id, t.turn_idx, t.role, t.text, t.tool, t.ts))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val docs = numbered.map(t => Doc(t.doc_id, t.text))
    val dls = TermFreqs.docLengths(docs)
    val batchStats = TermFreqs.corpusStats(dls)
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
      .write.mode(SaveMode.Overwrite).parquet(s"$root/dictionary_new")
    swap(spark, s"$root/dictionary_new", paths.dictionary)

    val stats = CorpusStats(nNew, totNew, avgdlNew)
    Seq(stats).toDS().write.mode(SaveMode.Overwrite).parquet(s"$root/corpus_stats_new")
    swap(spark, s"$root/corpus_stats_new", paths.corpusStats)
    Seq(IndexMeta(buckets, targetRun, off + batchStats.n_docs, incremental = true))
      .toDS().write.mode(SaveMode.Overwrite).parquet(s"$root/meta_new")
    swap(spark, s"$root/meta_new", s"$root/meta")
    stats
  }

  /** Atomic-ish replace (write-new + rename) so readers never see a
    * half-written stats table between micro-batches. Hadoop FS rename —
    * works on any cluster filesystem, not just local.
    */
  private def swap(spark: SparkSession, newPath: String, path: String): Unit =
    graft.io.Fs.replace(newPath, path)

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
      .foreachBatch { (batch: Dataset[Turn], _: Long) =>
        ingestBatch(batch, root, buckets, targetRun)
        batches += 1
        if (compactEvery > 0 && batches % compactEvery == 0)
          Compaction.compact(spark, root)
      }
      .start()
  }
}
