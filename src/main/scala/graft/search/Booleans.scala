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
    Catalog.readParquet(spark, IndexPaths(root).postings)
      .filter($"bucket" === b && $"term" === term)
      .select($"n_docs", $"doc_deltas_vb")
      .as[(Int, Array[Byte])]
      .flatMap { case (n, deltas) => Codec.decodeDeltas(deltas, n) }
      .toDF("doc_id")
      .transform(graft.index.Deletes.filterLive(_, root))
  }

  /** Docs containing ALL terms (conjunction): left-semi chain. */
  def and(spark: SparkSession, root: String, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty)
    import spark.implicits._
    terms.map(docsOf(spark, root, _))
      .reduce((a, b) => a.join(b, Seq("doc_id"), "left_semi"))
      .orderBy($"doc_id")
  }

  /** Docs containing ANY term (disjunction, unscored): union + distinct. */
  def or(spark: SparkSession, root: String, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty)
    import spark.implicits._
    terms.map(docsOf(spark, root, _))
      .reduce(_ union _)
      .distinct()
      .orderBy($"doc_id")
  }

  /** Docs containing `pos` but not `neg` (left-anti). */
  def andNot(spark: SparkSession, root: String, pos: String, neg: String): DataFrame = {
    import spark.implicits._
    docsOf(spark, root, pos)
      .join(docsOf(spark, root, neg), Seq("doc_id"), "left_anti")
      .orderBy($"doc_id")
  }

  /** Bitmap conjunction: per docID-range shard, decode each term's blocks
    * into a Roaring64 bitmap and intersect — the scale path for boolean
    * filters (RoaringBitmap ships with Spark). Equivalent to [[and]]; the
    * set ops run partition-local at bitmap speed and only the surviving
    * docIDs leave the shard, instead of shuffling full docID sets through
    * semi-joins.
    */
  def andBitmap(spark: SparkSession, root: String, terms: Seq[String],
      shardsOpt: Option[Int] = None): DataFrame = {
    require(terms.nonEmpty)
    import spark.implicits._
    val meta = Indexer.readMeta(spark, root)
    val shards = shardsOpt.getOrElse(spark.sessionState.conf.numShufflePartitions)
    val width = math.max(1L, (meta.doc_id_space + shards - 1) / shards)
    val qBuckets = terms.map(Blocks.bucketOf(_, meta.buckets)).distinct
    val nTerms = terms.size
    val termSet = terms.toSet

    Catalog.readPostings(spark, Catalog.IndexPaths(root))
      .filter($"bucket".isin(qBuckets: _*) && $"term".isin(terms: _*))
      .flatMap(b => ((b.first_doc / width) to (b.last_doc / width)).iterator.map(s => (s.toInt, b)))
      .groupByKey(_._1)
      .flatMapGroups { (shard, it) =>
        val lo = shard.toLong * width
        val hi = lo + width
        val maps = scala.collection.mutable.Map[String, org.roaringbitmap.longlong.Roaring64NavigableMap]()
        it.foreach { case (_, b) =>
          if (termSet.contains(b.term)) {
            val bm = maps.getOrElseUpdate(b.term, new org.roaringbitmap.longlong.Roaring64NavigableMap())
            val docs = Codec.decodeDeltas(b.doc_deltas_vb, b.n_docs)
            var i = 0
            while (i < docs.length) {
              if (docs(i) >= lo && docs(i) < hi) bm.addLong(docs(i))
              i += 1
            }
          }
        }
        if (maps.size < nTerms) Iterator.empty
        else {
          val result = maps(terms.head)
          terms.tail.foreach(t => result.and(maps(t)))
          val out = new scala.collection.mutable.ArrayBuffer[Long](result.getIntCardinality)
          val li = result.getLongIterator
          while (li.hasNext) out += li.next()
          out.iterator
        }
      }
      .toDF("doc_id")
      .transform(graft.index.Deletes.filterLive(_, root))
      .orderBy($"doc_id")
  }
}
