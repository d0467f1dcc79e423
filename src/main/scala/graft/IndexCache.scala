package graft

import org.apache.spark.sql.SparkSession

import graft.index.Indexer
import graft.io.Catalog

/** Per-JVM cache of indexes built over a testdata sfDir, so the many
  * index-backed SparkEntry.queries entries share one build per Verify/Bench
  * run instead of rebuilding per query.
  *
  * The cache dir is keyed by a per-JVM tag: stale indexes from an older code
  * version can never be picked up across driver invocations.
  */
object IndexCache {

  private val jvmTag = java.util.UUID.randomUUID().toString.take(8)
  private val built = scala.collection.mutable.Map[String, Indexer.BuildResult]()

  /** Sandbox-scale knobs: targetRun small enough that the sf0.01 head terms
    * (df ≈ 400) actually exercise salting; buckets = 16.
    */
  val Buckets = 16
  val TargetRun = 256L

  def documentsIndex(spark: SparkSession, sfDir: String): Indexer.BuildResult =
    synchronized {
      built.getOrElseUpdate(sfDir, {
        val key = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
        val root = s"/tmp/graft-index-$jvmTag/$key/documents"
        Indexer.buildFromDocs(Catalog.readDocuments(spark, sfDir), root,
          buckets = Buckets, targetRun = TargetRun)
      })
    }

  /** Keyword-field postings over the cached documents index (built once per
    * (sfDir, field); KeywordIndex.add's marker makes it idempotent anyway).
    */
  def keywordField(spark: SparkSession, sfDir: String, field: String): Unit = {
    val idx = documentsIndex(spark, sfDir)
    graft.index.KeywordIndex.add(spark, idx.paths.root,
      Catalog.readTable(spark, sfDir, "documents"), field)
  }

  /** Index copy with `deleteByQuery(delTerms)` tombstones live (ES
    * soft-deletes: stats untouched, query-time exclusion). A separate root
    * per variant so the delete never leaks into the shared [[documentsIndex]]
    * the other queries run against.
    */
  def deletedIndex(spark: SparkSession, sfDir: String,
      delTerms: Seq[String]): Indexer.BuildResult = synchronized {
    built.getOrElseUpdate(s"$sfDir#deleted#${delTerms.mkString(",")}", {
      val key = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
      // root carries the sanitized delTerms like the cache key: two variants
      // in one JVM would otherwise share a root where the first variant's
      // published deletes pointer survives the second's rebuild (ADVICE r3;
      // the full terms, not a 32-bit hash — hash collisions would silently
      // recreate the shared-root bug)
      val root = s"/tmp/graft-index-$jvmTag/$key/" +
        s"documents_deleted_${delTerms.mkString("_").replaceAll("[^A-Za-z0-9_]", "")}"
      val res = Indexer.buildFromDocs(Catalog.readDocuments(spark, sfDir), root,
        buckets = Buckets, targetRun = TargetRun)
      graft.index.Deletes.deleteByQuery(spark, root, delTerms)
      res
    })
  }

  /** [[deletedIndex]] after the expunge merge: tombstoned docs rewritten out
    * and all stats recomputed over the live corpus ([[graft.index.Deletes.purge]]).
    */
  def purgedIndex(spark: SparkSession, sfDir: String,
      delTerms: Seq[String]): Indexer.BuildResult = synchronized {
    built.getOrElseUpdate(s"$sfDir#purged#${delTerms.mkString(",")}", {
      val key = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
      val root = s"/tmp/graft-index-$jvmTag/$key/" +
        s"documents_purged_${delTerms.mkString("_").replaceAll("[^A-Za-z0-9_]", "")}"
      val res = Indexer.buildFromDocs(Catalog.readDocuments(spark, sfDir), root,
        buckets = Buckets, targetRun = TargetRun)
      graft.index.Deletes.deleteByQuery(spark, root, delTerms)
      graft.index.Deletes.purge(spark, root)
      res
    })
  }

  /** Scored index over the `title` subfield — the first 8 analyzed tokens
    * of each doc, re-joined (analyzer-closed, so re-analysis yields exactly
    * those tokens). A REAL second field with its own df/dl/avgdl stats, the
    * prerequisite for ES multi_match (per-field similarity, as ES keeps
    * per-field statistics).
    */
  def titleIndex(spark: SparkSession, sfDir: String): Indexer.BuildResult =
    synchronized {
      built.getOrElseUpdate(s"$sfDir#title8", {
        val key = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
        val root = s"/tmp/graft-index-$jvmTag/$key/documents_title8"
        import spark.implicits._
        val titles = Catalog.readDocuments(spark, sfDir)
          .map(d => graft.model.Doc(d.doc_id,
            graft.core.Analyzer.tokenize(d.text).take(8).mkString(" ")))
        Indexer.buildFromDocs(titles, root, buckets = Buckets, targetRun = TargetRun)
      })
    }

  /** English-analyzed documents index (stopwords + Porter, ES `english`
    * analyzer shape). Separate root: df/dl/avgdl all differ from the
    * standard index, and meta pins analyzer="english" so the query paths
    * re-analyze identically.
    */
  def englishIndex(spark: SparkSession, sfDir: String): Indexer.BuildResult =
    synchronized {
      built.getOrElseUpdate(s"$sfDir#english", {
        val key = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
        val root = s"/tmp/graft-index-$jvmTag/$key/documents_english"
        Indexer.buildFromDocs(Catalog.readDocuments(spark, sfDir), root,
          buckets = Buckets, targetRun = TargetRun, analyzer = "english")
      })
    }

  /** ES `_reindex` with a source query: a new index built from the FILTERED
    * corpus (stats reflect only surviving docs, exactly as a reindexed ES
    * index). At scale the filter rides the source scan (predicate pushdown)
    * and the rebuild is the ordinary build pipeline — _reindex IS a build
    * whose input is another index's stored corpus.
    */
  def reindexedSource(spark: SparkSession, sfDir: String,
      source: String): Indexer.BuildResult = synchronized {
    built.getOrElseUpdate(s"$sfDir#reindex#$source", {
      import spark.implicits._
      val key = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
      val root = s"/tmp/graft-index-$jvmTag/$key/documents_reindex_$source"
      val docs = Catalog.readTable(spark, sfDir, "documents")
        .filter($"source" === source)
        .select($"doc_id", $"text").as[graft.model.Doc]
      Indexer.buildFromDocs(docs, root, buckets = Buckets, targetRun = TargetRun)
    })
  }

  /** Search-as-you-type index: `edge_ngram` analysis (grams 2..5) at index
    * time, `standard` at query time (Analyzer.searchForm), so a typed
    * prefix scores against the gram postings with the gram field's own
    * BM25 stats — the ES search_as_you_type shape.
    */
  def edgeNgramIndex(spark: SparkSession, sfDir: String): Indexer.BuildResult =
    synchronized {
      built.getOrElseUpdate(s"$sfDir#edge", {
        val key = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
        val root = s"/tmp/graft-index-$jvmTag/$key/documents_edge"
        Indexer.buildFromDocs(Catalog.readDocuments(spark, sfDir), root,
          buckets = Buckets, targetRun = TargetRun, analyzer = "edge_ngram")
      })
    }

  /** The driver's index-time synonym contraction (Lucene `merge,unify =>
    * join` shape over fixture vocabulary): postings/df/stats reflect the
    * merged group. Shared by the bm25_synonyms_indexed query and its oracle.
    */
  val IndexSynonyms: Map[String, String] = Map("merge" -> "join")

  /** Documents index with [[IndexSynonyms]] baked in at analysis time
    * (meta.synonyms → query terms canonicalize through the same map).
    */
  def synonymsIndex(spark: SparkSession, sfDir: String): Indexer.BuildResult =
    synchronized {
      built.getOrElseUpdate(s"$sfDir#syn", {
        val key = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
        val root = s"/tmp/graft-index-$jvmTag/$key/documents_syn"
        Indexer.buildFromDocs(Catalog.readDocuments(spark, sfDir), root,
          buckets = Buckets, targetRun = TargetRun, synonyms = IndexSynonyms)
      })
    }

  private val lshBuilt = scala.collection.mutable.Map[String, String]()

  /** LSH bucket table over `embeddings`, computed once per sfDir and
    * persisted (the production shape: buckets are an index artifact, built
    * once, probed many times — never recomputed per query).
    */
  def lshBucketsPath(spark: SparkSession, sfDir: String, planes: Int = 8): String =
    synchronized {
      lshBuilt.getOrElseUpdate(s"$sfDir#$planes", {
        val key = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
        val path = s"/tmp/graft-index-$jvmTag/$key/lsh_buckets_$planes"
        graft.operators.Embeddings
          .lshBuckets(Catalog.readTable(spark, sfDir, "embeddings"), planes)
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)
        path
      })
    }

  private val ivfBuilt = scala.collection.mutable.Map[String, (Array[Array[Double]], String)]()

  /** IVF coarse quantizer + persisted list assignment over `embeddings` —
    * trained/assigned once per corpus (the FAISS offline-train shape).
    */
  private val ivfPqBuilt =
    scala.collection.mutable.Map[String, (graft.operators.IvfPq.Model, String)]()

  /** IVF-PQ model + encoded-codes table (built once per sfDir): 16 coarse
    * lists, 8 subspaces × 16 codes over 64-dim embeddings — 8 code bytes +
    * a norm per vector instead of 256 float bytes.
    */
  def ivfPq(spark: SparkSession, sfDir: String, nlist: Int = 16, m: Int = 8)
      : (graft.operators.IvfPq.Model, String) = synchronized {
    ivfPqBuilt.getOrElseUpdate(s"$sfDir#$nlist#$m", {
      val key = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
      val path = s"/tmp/graft-index-$jvmTag/$key/ivfpq_codes_${nlist}_$m"
      val model = graft.operators.IvfPq.train(spark, sfDir, nlist, m)
      graft.operators.IvfPq
        .encode(Catalog.readTable(spark, sfDir, "embeddings"), model)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("list_id").parquet(path)
      (model, path)
    })
  }

  def ivf(spark: SparkSession, sfDir: String, nlist: Int = 16)
      : (Array[Array[Double]], String) = synchronized {
    ivfBuilt.getOrElseUpdate(s"$sfDir#$nlist", {
      val key = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
      val path = s"/tmp/graft-index-$jvmTag/$key/ivf_lists_$nlist"
      val centroids = graft.operators.Ivf.trainCentroids(spark, sfDir, nlist)
      graft.operators.Ivf
        .assignLists(Catalog.readTable(spark, sfDir, "embeddings"), centroids)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)
      (centroids, path)
    })
  }

  private val bigramBuilt = scala.collection.mutable.Set[String]()

  /** Documents index with the corpus bigram-count LM artifact published
    * (index.BigramLm — built once per sfDir, like the positional index; the
    * phrase suggester reads it instead of re-aggregating the corpus).
    */
  def bigramIndex(spark: SparkSession, sfDir: String): Indexer.BuildResult =
    synchronized {
      val res = documentsIndex(spark, sfDir)
      if (!bigramBuilt.contains(sfDir)) {
        graft.index.BigramLm.build(
          Catalog.readDocuments(spark, sfDir), res.paths.root)
        bigramBuilt += sfDir
      }
      res
    }

  private val completionBuilt = scala.collection.mutable.Map[String, String]()

  /** Completion-suggester artifact over `documents` (per-(context, term)
    * df, context = `source`), built once per sfDir — the FST-analog table
    * Suggest.completion probes.
    */
  def completionPath(spark: SparkSession, sfDir: String): String =
    synchronized {
      completionBuilt.getOrElseUpdate(sfDir, {
        val key = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
        val path = s"/tmp/graft-index-$jvmTag/$key/completion"
        graft.search.Suggest.buildCompletion(spark, sfDir, path)
        path
      })
    }

  private val posBuilt = scala.collection.mutable.Set[String]()

  /** Positional index over the same corpus/root (built on first use). */
  def positionalIndex(spark: SparkSession, sfDir: String): Indexer.BuildResult =
    synchronized {
      val res = documentsIndex(spark, sfDir)
      if (!posBuilt.contains(sfDir)) {
        val parts = spark.sessionState.conf.numShufflePartitions
        graft.index.PositionalIndex.build(
          Catalog.readDocuments(spark, sfDir), res.paths.root,
          buckets = res.meta.buckets, grids = parts * 2,
          docIdSpace = res.meta.doc_id_space, numPartitions = parts)
        posBuilt += sfDir
      }
      res
    }
}
