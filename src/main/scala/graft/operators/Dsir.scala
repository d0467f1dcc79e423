package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Analyzer
import graft.io.Catalog

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023, arXiv
  * 2302.03169): score every raw document by how target-like it is under
  * hashed-n-gram bag models, `log w(x) = Σ_ng log p_target(b(ng)) −
  * log p_raw(b(ng))`, then select by weight. The standard recipe for
  * steering a web-scale corpus toward a small high-quality target domain
  * without training a classifier.
  *
  * Determinism contract (what the DuckDB twin recomputes): features are
  * token unigrams + bigrams, bucketed by the FIRST BYTE of their md5 hex
  * (mod `nBuckets`); both distributions are add-1-smoothed occurrence
  * counts. Everything is closed-form column arithmetic — no sampling, no
  * training.
  *
  * Scale shape: one tokenize+explode pass over the corpus, a `nBuckets`-row
  * aggregation (map-side partials; the bucket table is constant-size at any
  * corpus scale), the log-ratio table broadcast back, one per-doc sum.
  * No self-joins, no windows; the raw-vs-target totals ride the same
  * aggregation. ES has no analog — this is pipeline surface.
  */
object Dsir {

  private val Hex = "0123456789abcdef"

  /** (doc_id, is_target, bucket) — one row per n-gram occurrence. */
  private def features(docs: DataFrame, targetPred: org.apache.spark.sql.Column,
      nBuckets: Int): DataFrame = {
    import docs.sparkSession.implicits._
    // coalesce marks the bucket non-nullable (conv-of-md5 can never be null,
    // so the fallback value is unreachable and results are unchanged):
    // without it the downstream join's IsNotNull(bucket) pushed below this
    // projection and re-derived md5+conv PER ROW a second time (guide §7.2
    // duplicated-expression smell, visible as Filter isnotnull(conv(md5…))
    // in the r6 plan). ensureParallelism: tokenize+md5 is the heavy pass.
    Catalog.ensureParallelism(docs)
      .select($"doc_id", targetPred.as("is_target"),
        Analyzer.tokensCol($"text").as("t"))
      .select($"doc_id", $"is_target",
        explode(concat($"t",
          when(size($"t") >= 2,
            expr("transform(sequence(0, size(t)-2), i -> concat(t[i], '_', t[i+1]))"))
            .otherwise(expr("array()")))).as("ng"))
      .select($"doc_id", $"is_target",
        coalesce(conv(substring(md5($"ng".cast("binary")), 1, 2), 16, 10)
          .cast("int") % nBuckets, lit(0)).as("bucket"))
  }

  /** Per-doc log importance weight vs the `targetSource` domain; top `k`
    * most target-like docs.
    */
  def importanceWeights(spark: SparkSession, sfDir: String,
      targetSource: String, k: Int, nBuckets: Int = 64): DataFrame = {
    import spark.implicits._
    val docs = Catalog.readTable(spark, sfDir, "documents")
    val feats = features(docs, $"source" === targetSource, nBuckets)

    // constant-size bucket census: occurrence counts per bucket, target and
    // raw, plus totals — 64 rows regardless of corpus size
    val census = feats.groupBy($"bucket")
      .agg(count(lit(1)).as("rc"),
        sum(when($"is_target", 1L).otherwise(0L)).as("tc"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val rTotal = census.map(_._2).sum.toDouble
    val tTotal = census.map(_._3).sum.toDouble
    val ratios = census.map { case (b, rc, tc) =>
      (b, math.log((tc + 1.0) / (tTotal + nBuckets)) -
        math.log((rc + 1.0) / (rTotal + nBuckets)))
    }.toSeq
    val ratioDf = broadcast(spark.createDataset(ratios).toDF("bucket", "lr"))

    feats.join(ratioDf, "bucket")
      .groupBy($"doc_id")
      .agg(sum($"lr").as("logw"))
      .orderBy($"logw".desc, $"doc_id".asc)
      .limit(k)
      .select($"doc_id", round($"logw", 6).as("logw_r6"))
  }
}
