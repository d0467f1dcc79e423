package graft.search

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Catalog

/** ES `function_score` — deterministic per-document score modifiers composed
  * with the main BM25 query (the two most-used functions):
  *
  *  - [[fieldValueFactor]]: `field_value_factor` — final =
  *    bm25 ⊙ modifier(factor · doc[field]), ES's exact application order
  *    (factor first, then the modifier fn; `missing` substitutes for null).
  *    ES's `log` family is base-10 (Lucene's LogFunction), `ln` natural.
  *  - [[decay]]: `gauss` / `exp` / `linear` decay on a numeric field —
  *    dates decay with the same arithmetic on epoch values, so a `ts`
  *    column needs only a cast upstream. Shape parameters follow the ES
  *    definition: the curve passes through `decay` at distance `scale`
  *    from `origin`, distances under `offset` don't decay at all.
  *      gauss:  exp(−max(0,|v−origin|−offset)² / (2σ²)),
  *              σ² = −scale² / (2·ln decay)
  *      exp:    exp(λ·max(0,|v−origin|−offset)), λ = ln(decay)/scale
  *      linear: max(0, (s − max(0,|v−origin|−offset)) / s),
  *              s = scale / (1 − decay)
  *
  * Plan and scale: ES applies function_score to EVERY matching doc (unlike
  * `rescore`, which re-ranks a window), so the exact plan is the
  * exhaustive-pruned family — [[SearchEngine.scoreAllDocs]] over the query
  * terms' postings only (bucket pruning + term pushdown, never a corpus
  * scan), then a doc-keyed join against the 2-column pruned metadata scan
  * (uniform key, map-side-partial aggregates upstream), function applied as
  * a codegen'd Column, TakeOrdered top-k. A rank-safe WAND variant would
  * need a corpus-wide upper bound on the modifier folded into the block-max
  * bounds; the pruned-exhaustive shape is exact without it and matches the
  * synonym/cross_fields family's cost argument.
  */
object FunctionScore {

  /** ES modifier functions (field_value_factor.modifier). */
  private def applyModifier(v: Column, modifier: String): Column = modifier match {
    case "none" => v
    case "log" => log10(v)
    case "log1p" => log10(v + lit(1.0))
    case "log2p" => log10(v + lit(2.0))
    case "ln" => log(v)
    case "ln1p" => log(v + lit(1.0))
    case "ln2p" => log(v + lit(2.0))
    case "square" => v * v
    case "sqrt" => sqrt(v)
    case "reciprocal" => lit(1.0) / v
    case m => throw new IllegalArgumentException(s"unknown modifier: $m")
  }

  private def combine(score: Column, fn: Column, boostMode: String): Column =
    boostMode match {
      case "multiply" => score * fn
      case "sum" => score + fn
      case m => throw new IllegalArgumentException(s"unknown boost_mode: $m")
    }

  def fieldValueFactor(spark: SparkSession, root: String, sfDir: String,
      rawTerms: Seq[String], k: Int, field: String = "n_chars",
      factor: Double = 1.0, modifier: String = "log1p",
      missing: Double = 1.0, boostMode: String = "multiply"): DataFrame = {
    import spark.implicits._
    val scored = SearchEngine.scoreAllDocs(spark, root, rawTerms)
    val meta = Catalog.readTable(spark, sfDir, "documents")
      .select($"doc_id", col(field))
    val fv = applyModifier(
      coalesce(col(field).cast("double"), lit(missing)) * lit(factor), modifier)
    scored.join(meta, "doc_id")
      .select($"doc_id", combine($"score", fv, boostMode).as("fscore"))
      .orderBy($"fscore".desc, $"doc_id".asc)
      .limit(k)
      .select($"doc_id", round($"fscore", 4).as("fscore_r4"))
  }

  def decay(spark: SparkSession, root: String, sfDir: String,
      rawTerms: Seq[String], k: Int, field: String, origin: Double,
      scale: Double, offset: Double = 0.0, decayAt: Double = 0.5,
      fn: String = "gauss", boostMode: String = "multiply"): DataFrame = {
    import spark.implicits._
    require(scale > 0.0 && decayAt > 0.0 && decayAt < 1.0,
      "scale > 0 and decay in (0,1), as ES")
    val scored = SearchEngine.scoreAllDocs(spark, root, rawTerms)
    val meta = Catalog.readTable(spark, sfDir, "documents")
      .select($"doc_id", col(field))
    val x = greatest(lit(0.0),
      abs(col(field).cast("double") - lit(origin)) - lit(offset))
    val d = fn match {
      case "gauss" =>
        val sigma2 = -scale * scale / (2.0 * math.log(decayAt))
        exp(-(x * x) / lit(2.0 * sigma2))
      case "exp" =>
        exp(lit(math.log(decayAt) / scale) * x)
      case "linear" =>
        val s = scale / (1.0 - decayAt)
        greatest(lit(0.0), (lit(s) - x) / lit(s))
      case f => throw new IllegalArgumentException(s"unknown decay fn: $f")
    }
    scored.join(meta, "doc_id")
      .select($"doc_id", combine($"score", d, boostMode).as("fscore"))
      .orderBy($"fscore".desc, $"doc_id".asc)
      .limit(k)
      .select($"doc_id", round($"fscore", 4).as("fscore_r4"))
  }

  /** ES `rank_feature` query (saturation function, the default): a bool
    * `should` clause contributing `boost · x / (x + pivot)` per doc on top
    * of the main match score — the shape ES recommends for static signals
    * (pagerank, url_length, …) because saturation bounds the contribution
    * by `boost` no matter how large the feature gets.
    *
    * ES stores rank features in a dedicated field type so the contribution
    * can drive skipping; here the feature is a metadata column, so the plan
    * is the same exhaustive-pruned family as [[fieldValueFactor]]: postings
    * of the query terms only, 2-column metadata join, codegen'd saturation,
    * TakeOrdered. The additive form (`boost_mode: sum`) is the bool-should
    * composition ES documents for rank_feature.
    */
  def rankFeature(spark: SparkSession, root: String, sfDir: String,
      rawTerms: Seq[String], k: Int, field: String, pivot: Double,
      boost: Double): DataFrame = {
    import spark.implicits._
    require(pivot > 0.0, "rank_feature pivot must be positive, as ES")
    val scored = SearchEngine.scoreAllDocs(spark, root, rawTerms)
    val meta = Catalog.readTable(spark, sfDir, "documents")
      .select($"doc_id", col(field))
    val x = col(field).cast("double")
    val sat = lit(boost) * (x / (x + lit(pivot)))
    scored.join(meta, "doc_id")
      .select($"doc_id", ($"score" + sat).as("fscore"))
      .orderBy($"fscore".desc, $"doc_id".asc)
      .limit(k)
      .select($"doc_id", round($"fscore", 4).as("fscore_r4"))
  }

  /** ES `distance_feature` query: a bool `should` clause contributing
    * `boost · pivot / (pivot + |value − origin|)` per doc — full boost at
    * the origin, half at `pivot` away, decaying hyperbolically (the shape
    * ES uses for date/geo recency boosts; a date field decays the same way
    * on its epoch value). Differs from the `gauss`/`exp` decay functions in
    * kernel and composition: distance_feature is ADDITIVE (a should clause),
    * decay functions default to multiplicative function_score.
    *
    * Same exhaustive-pruned plan family as [[rankFeature]]: postings of the
    * query terms only, a 2-column metadata join, codegen'd arithmetic,
    * TakeOrdered — no corpus scan, no window.
    */
  def distanceFeature(spark: SparkSession, root: String, sfDir: String,
      rawTerms: Seq[String], k: Int, field: String, origin: Double,
      pivot: Double, boost: Double): DataFrame = {
    import spark.implicits._
    require(pivot > 0.0, "distance_feature pivot must be positive, as ES")
    val scored = SearchEngine.scoreAllDocs(spark, root, rawTerms)
    val meta = Catalog.readTable(spark, sfDir, "documents")
      .select($"doc_id", col(field))
    val dist = abs(col(field).cast("double") - lit(origin))
    val contrib = lit(boost) * (lit(pivot) / (lit(pivot) + dist))
    scored.join(meta, "doc_id")
      .select($"doc_id", ($"score" + contrib).as("fscore"))
      .orderBy($"fscore".desc, $"doc_id".asc)
      .limit(k)
      .select($"doc_id", round($"fscore", 4).as("fscore_r4"))
  }

  /** ES `boosting` query: positive-query score, demoted by `negativeBoost`
    * for docs matching the negative term (matching docs stay in the result,
    * unlike `must_not`). Same exhaustive-pruned family as the rest of this
    * file — the demotion only LOWERS scores, so a WAND pass on undemoted
    * bounds would still be admissible, but it needs the negative set inside
    * the shard scorer; at one extra narrow postings scan the pruned-
    * exhaustive form is exact and simpler (Lucene's FunctionScoreQuery
    * rewrite of BoostingQuery scores every positive match too).
    */
  def boosting(spark: SparkSession, root: String, posTerms: Seq[String],
      negTerm: String, negativeBoost: Double, k: Int): DataFrame = {
    import spark.implicits._
    val scored = SearchEngine.scoreAllDocs(spark, root, posTerms)
    val neg = Booleans.docsOf(spark, root, negTerm)
      .withColumn("is_neg", lit(true))
    scored.join(neg, Seq("doc_id"), "left_outer")
      .select($"doc_id",
        when($"is_neg", $"score" * lit(negativeBoost))
          .otherwise($"score").as("fscore"))
      .orderBy($"fscore".desc, $"doc_id".asc)
      .limit(k)
      .select($"doc_id", round($"fscore", 4).as("fscore_r4"))
  }

  /** ES `constant_score`: every doc matching the filter term scores exactly
    * `boost` — one unscored postings read (bucket-pruned, term-pushdown),
    * no stats, no tf decode needed beyond docIDs. Ties (all of them) break
    * on doc_id, as Lucene's index-order tiebreak.
    */
  def constantScore(spark: SparkSession, root: String, term: String,
      boost: Double, k: Int): DataFrame = {
    import spark.implicits._
    Booleans.docsOf(spark, root, term)
      .orderBy($"doc_id")
      .limit(k)
      .select($"doc_id", round(lit(boost), 4).as("score_r4"))
  }
}
