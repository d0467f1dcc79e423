package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Embeddings

/** Hybrid retrieval: Reciprocal Rank Fusion of the lexical (BM25/WAND) and
  * semantic (embedding-cosine) rankings — the ES 8 `rrf` retriever
  * (Cormack et al., SIGIR 2009: score(d) = Σ_r 1/(k0 + rank_r(d))).
  *
  * Shape: two top-`window` retrievals (each already scale-shaped: WAND
  * skipping / brute-force or LSH cosine), then fusion over ≤ 2·window rows
  * on the driver — O(window), corpus-size-independent, exactly how ES
  * fuses per-retriever windows. Deterministic: both input rankings are
  * deterministic, fusion ties break on doc_id.
  */
object Hybrid {

  def rrfTopK(spark: SparkSession, root: String, sfDir: String,
      rawTerms: Seq[String], probeId: Long, k: Int,
      window: Int = 50, k0: Int = 60): DataFrame = {
    import spark.implicits._
    val lex = SearchEngine.topKWand(spark, root, rawTerms, window)
      .select($"doc_id").as[Long].collect()
    val sem = Embeddings.cosineTopK(spark, sfDir, probeId, window)
      .select($"vec_id".cast("long")).as[Long].collect()
    val lexRank = lex.zipWithIndex.map { case (d, i) => d -> (i + 1) }.toMap
    val semRank = sem.zipWithIndex.map { case (d, i) => d -> (i + 1) }.toMap
    val fused = (lexRank.keySet ++ semRank.keySet).toSeq
      .map { id =>
        val s = lexRank.get(id).map(r => 1.0 / (k0 + r)).getOrElse(0.0) +
          semRank.get(id).map(r => 1.0 / (k0 + r)).getOrElse(0.0)
        (id, s)
      }
      .sortBy { case (id, s) => (-s, id) }
      .take(k)
    spark.createDataset(fused).toDF("doc_id", "rrf")
      .select($"doc_id", round($"rrf", 6).as("rrf_r6"))
  }

  /** ES `pinned` query: the given ids rank first, IN THE GIVEN ORDER and
    * whether or not they match (ES's promoted-results contract); organic
    * results (excluding pins) fill the remaining `k − |pins|` slots in
    * (score desc, doc_id asc) order.
    *
    * One WAND pass of `k + |pins|` (a superset of the needed organic rows
    * even if every pin also ranks organically), the ≤ k+|pins| hits
    * collected — the same k-row driver composition as search_after.
    */
  def pinnedTopK(spark: SparkSession, root: String, pins: Seq[Long],
      rawTerms: Seq[String], k: Int): DataFrame = {
    import spark.implicits._
    require(pins.size <= k, "more pins than result slots")
    val pinSet = pins.toSet
    val organic = SearchEngine.topKWand(spark, root, rawTerms, k + pins.size)
      .as[graft.model.Hit].collect()
      .filter(h => !pinSet.contains(h.doc_id))
      .take(k - pins.size)
    val rows = pins.zipWithIndex.map { case (d, i) => (i + 1L, d, true) } ++
      organic.zipWithIndex.map { case (h, i) => (pins.size + i + 1L, h.doc_id, false) }
    spark.createDataset(rows).toDF("rnk", "doc_id", "pinned")
  }
}
