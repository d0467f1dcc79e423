package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Analyzer
import graft.io.Catalog

/** Text-analysis operators for training-data curation: language ID
  * (marker-token heuristic), quality scoring, token counting, and
  * winnowing document fingerprints. All deterministic, engine-portable
  * Column DSL with DuckDB oracle twins.
  */
object TextAnalysis {

  /** Marker-token language heuristic (n-gram-free variant suited to the
    * whitespace corpus): counts of language-marker stopwords decide the
    * label, 'und' when no markers hit.
    */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Catalog.readTable(spark, sfDir, "documents")
      .select($"doc_id", Analyzer.tokensCol($"text").as("t"))
      .select($"doc_id",
        size(expr("array_intersect(t, array('the', 'a', 'of', 'and'))")).as("n_en"),
        size(expr("array_intersect(t, array('el', 'la', 'de', 'los'))")).as("n_es"))
      .select($"doc_id",
        when($"n_en" >= $"n_es" && $"n_en" > 0, "en")
          .when($"n_es" > 0, "es")
          .otherwise("und").as("lang_pred"))
      .orderBy($"doc_id")
  }

  /** Quality scoring: token count, mean token length, stopword ratio, and a
    * composite score in [0,1] (length-saturating × non-stopword mass).
    */
  def qualityScore(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Catalog.readTable(spark, sfDir, "documents")
      .select($"doc_id", Analyzer.tokensCol($"text").as("t"))
      .select($"doc_id",
        size($"t").cast("long").as("n_tokens"),
        expr("aggregate(t, CAST(0 AS BIGINT), (acc, x) -> acc + length(x))").as("chars"),
        expr("size(filter(t, x -> x = 'the' OR x = 'a'))").cast("long").as("n_stop"))
      .select($"doc_id", $"n_tokens",
        round($"chars" * lit(1.0) / $"n_tokens", 6).as("mean_tok_len_r6"),
        round($"n_stop" * lit(1.0) / $"n_tokens", 6).as("stop_ratio_r6"),
        round(least($"n_tokens" * lit(1.0) / 100.0, lit(1.0)) *
          (lit(1.0) - $"n_stop" * lit(1.0) / $"n_tokens"), 6).as("quality_r6"))
      .orderBy($"doc_id")
  }

  /** Token counting two ways: whitespace split and a BPE-ish regex
    * (alnum runs + single punctuation marks).
    */
  def tokenCounts(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Catalog.readTable(spark, sfDir, "documents")
      .select($"doc_id",
        size(expr("filter(split(text, '\\\\s+'), x -> x <> '')")).cast("long").as("ws_tokens"),
        regexp_count(lower($"text"), lit("[a-z0-9]+|[^a-z0-9\\s]")).cast("long").as("bpe_ish_tokens"))
      .orderBy($"doc_id")
  }

  /** Unigram language-model perplexity per document — the CCNet/KenLM-style
    * quality filter (Wenzek et al. 2020): documents scoring far from the
    * corpus LM (high perplexity) are boilerplate/garbage candidates; the
    * production pipeline buckets on this per-doc number.
    *
    * The LM is trained on the corpus itself in one aggregation (term →
    * count), add-one smoothed over the observed vocabulary:
    * p(t) = (cf_t + 1) / (total + |V|); ppl(doc) = exp(−mean ln p).
    *
    * Scale shape: the count table is vocab-sized (Heaps' law: ~10^7 rows at
    * 100 TB — broadcastable; past that, a shuffled hash join on the uniform
    * `term` key), the scoring pass is explode → broadcast-join → per-doc
    * agg with map-side partials. No corpus self-join, no window. The
    * summation-order difference between engines is ~1e-14 relative, far
    * under the 1e-4 rounding.
    */
  def lmPerplexity(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tok = Catalog.readTable(spark, sfDir, "documents")
      .select($"doc_id", explode(Analyzer.tokensCol($"text")).as("term"))
    val cf = tok.groupBy($"term").agg(count(lit(1)).as("cf"))
    val tot = cf.agg(sum($"cf").as("total"), count(lit(1)).as("v"))
    tok.join(broadcast(cf), "term")
      .join(broadcast(tot))
      .select($"doc_id", log(($"cf" + lit(1.0)) / ($"total" + $"v")).as("lp"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"), round(exp(-avg($"lp")), 4).as("ppl_r4"))
      .orderBy($"doc_id")
  }

  /** CCNet's head/middle/tail split: documents bucketed by perplexity
    * terciles of [[lmPerplexity]] (Wenzek et al. 2020 §4.4 — head = closest
    * to the LM, the slice CCNet keeps by default). Thresholds interpolate
    * over the ROUNDED per-doc values so both engines bucket identical
    * numbers; `percentile` is exact here (one driver-sized value list, same
    * contract as percentiles_value) — at 100 TB the `approx_percentile`
    * sketch with fixed accuracy is the documented swap, changing thresholds
    * by a bounded rank error, not semantics.
    */
  def pplBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ppl = lmPerplexity(spark, sfDir).select($"doc_id", $"ppl_r4")
    val th = ppl.agg(
      round(expr("percentile(ppl_r4, CAST(1.0/3 AS DOUBLE))"), 6).as("t1"),
      round(expr("percentile(ppl_r4, CAST(2.0/3 AS DOUBLE))"), 6).as("t2"))
    ppl.crossJoin(broadcast(th))
      .select($"doc_id", $"ppl_r4",
        when($"ppl_r4" <= $"t1", "head")
          .when($"ppl_r4" <= $"t2", "middle")
          .otherwise("tail").as("bucket"))
      .orderBy($"doc_id")
  }

  /** Winnowing fingerprints (rolling-hash document fingerprinting): token
    * 3-gram md5 hashes, per-position window minimum (w = 4), distinct mins
    * summarized per doc. String-min over md5 hex — exact in both engines.
    */
  def winnowFingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val grams = Catalog.readTable(spark, sfDir, "documents")
      .select($"doc_id", Analyzer.tokensCol($"text").as("t"))
      .select($"doc_id", posexplode(
        when(size($"t") >= 3,
          expr("transform(sequence(0, size(t)-3), i -> md5(concat(t[i], '_', t[i+1], '_', t[i+2])))"))
          .otherwise(expr("array()"))))
      .toDF("doc_id", "pos", "h")
    val w = Window.partitionBy($"doc_id").orderBy($"pos").rowsBetween(-3, 0)
    grams
      .withColumn("wmin", min($"h").over(w))
      .filter($"pos" >= 3) // full windows only
      .groupBy($"doc_id")
      .agg(countDistinct($"wmin").as("n_fp"), min($"wmin").as("min_fp"), max($"wmin").as("max_fp"))
      .orderBy($"doc_id")
  }
}
