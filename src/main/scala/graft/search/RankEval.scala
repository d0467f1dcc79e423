package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Catalog

/** ES `_rank_eval`: IR quality metrics for a query's ranking against a
  * judgment list — precision@k, MRR, and NDCG@k, the three metrics the ES
  * API ships.
  *
  * Judgments here are derived deterministically from the corpus (graded
  * rel(doc) = number of DISTINCT query terms present, 0..|q|; "relevant"
  * for the binary metrics means rel ≥ 2) — in production they'd come from a
  * labeled table; the computation below is identical either way.
  *
  *   p_at_k = |{hit : rel ≥ 2}| / |retrieved| — ES's precision metric
  *            divides by the number of documents actually retrieved (≤ k),
  *            not the requested k, so sparse queries aren't penalized for
  *            a short result list (ADVICE r5); 0 when nothing is retrieved
  *   mrr    = 1 / (first rank with rel ≥ 2), 0 if none
  *   ndcg   = DCG / IDCG, DCG = Σ (2^rel − 1) / log₂(rank + 1),
  *            IDCG over the k best judgments corpus-wide
  *
  * Scale shape: the ranking is the standard WAND top-k (k rows on the
  * driver — this is the ES fetch phase's size by construction); rel needs
  * one narrow pass over the corpus tokens (array_intersect per doc — no
  * shuffle beyond the IDCG's TakeOrdered k). Metrics are arithmetic over
  * ≤ 2k tiny rows.
  */
object RankEval {

  /** Evaluate the ranking of `rawTerms` against judgments graded by
    * `judgmentTerms` (defaults to the query itself). Separating the two is
    * the API's real use: grade a cheap query against the full information
    * need ("join" alone, judged on join∧window∧vector) — with identical
    * term sets the metrics saturate on an easy corpus.
    */
  def evaluate(spark: SparkSession, root: String, sfDir: String,
      rawTerms: Seq[String], k: Int,
      judgmentTerms: Seq[String] = Nil): DataFrame = {
    import spark.implicits._
    val jt = if (judgmentTerms.nonEmpty) judgmentTerms else rawTerms
    val termArr = array(jt.map(lit): _*)
    val rel = Catalog.readTable(spark, sfDir, "documents")
      .select($"doc_id",
        size(array_intersect(graft.core.Analyzer.tokensCol($"text"), termArr))
          .cast("long").as("rel"))

    val ranked = SearchEngine.topKWand(spark, root, rawTerms, k)
      .select($"doc_id").as[Long].collect()  // already (score DESC, doc ASC)
    val relByDoc = rel
      .filter($"doc_id".isin(ranked.toSeq: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val idealRels = rel.orderBy($"rel".desc, $"doc_id".asc).limit(k)
      .select($"rel").as[Long].collect()

    def gain(relv: Long, rank: Int): Double =
      (math.pow(2.0, relv.toDouble) - 1.0) / (math.log(rank + 1.0) / math.log(2.0))

    val rels = ranked.zipWithIndex.map { case (d, i) => (relByDoc.getOrElse(d, 0L), i + 1) }
    val pAtK =
      if (ranked.isEmpty) 0.0 else rels.count(_._1 >= 2).toDouble / ranked.length
    val mrr = rels.find(_._1 >= 2).map(r => 1.0 / r._2).getOrElse(0.0)
    val dcg = rels.map { case (r, i) => gain(r, i) }.sum
    val idcg = idealRels.zipWithIndex.map { case (r, i) => gain(r, i + 1) }.sum
    val ndcg = if (idcg == 0.0) 0.0 else dcg / idcg

    Seq((pAtK, mrr, ndcg)).toDF("p", "m", "n")
      .select(round($"p", 6).as("p_at_k_r6"), round($"m", 6).as("mrr_r6"),
        round($"n", 6).as("ndcg_r6"))
  }
}
