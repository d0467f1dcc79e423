package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Catalog

/** SemDeDup-style semantic deduplication (Abbas et al. 2023, arXiv
  * 2303.09540): k-means-cluster the embedding space, then mark near-
  * duplicates ONLY within each cluster — a vector is a duplicate iff some
  * LOWER-id vector in its cluster has cosine similarity ≥ `tau` (keep-the-
  * first, deterministic; the paper keeps one representative per semantic
  * group).
  *
  * Scale shape — why this beats [[Embeddings.embCosinePairs]] for corpus
  * pruning at 100 TB: the LSH pair path enumerates candidate PAIRS
  * (output-bounded by collision structure), while SemDeDup bounds work by
  * CLUSTER: with k chosen so clusters average a few thousand vectors
  * (the paper uses k ≈ 11k for 100M+ docs), each cluster's pairwise pass is
  * a small dense block that never leaves its task, and the global cost is
  * Σ|cluster|² with every term bounded — no all-pairs join, no shuffle
  * beyond the one cluster-keyed exchange. The k-means train is the same
  * bounded deterministic driver Lloyd the IVF index uses ([[Ivf]] — shared
  * code), so the cluster model costs one 4096-vector sample regardless of
  * corpus size.
  *
  * A giant cluster (embedding-space skew) concentrates one task; the
  * mitigation at scale is raising k (the paper's regime) — documented here
  * rather than salted, because splitting a cluster changes which pairs are
  * compared (cross-shard pairs would be lost), unlike the rank-safe salting
  * of the index build.
  */
object SemDedup {

  /** Recorded while the driver query runs (`record = true`): the cluster
    * assignment (vec_id, list_id) and tau — SparkEntry.oracleSql turns it
    * into a DuckDB oracle that re-verifies every within-cluster pair with
    * exact cosine, so the only un-oracled step is k-means training itself
    * (pinned deterministic by IvfSpec, shared with ann_ivf_topk).
    */
  @volatile var lastOracle: Option[(Seq[(Long, Int)], Double)] = None

  /** Duplicates under SemDeDup: (vec_id, kept_by) — `kept_by` is the LOWEST
    * cluster-mate id with cosine ≥ tau (the retained representative).
    */
  def semanticDups(spark: SparkSession, sfDir: String, tau: Double,
      nClusters: Int = 8, record: Boolean = false): DataFrame = {
    import spark.implicits._
    val emb = Catalog.readTable(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding")
    val centroids = Ivf.trainCentroids(spark, sfDir, nClusters)
    val assigned = Ivf.assignLists(emb, centroids)

    if (record)
      lastOracle = Some((assigned.as[(Long, Int)].collect().sortBy(_._1).toSeq, tau))

    // one cluster-keyed exchange; the pairwise pass is task-local per
    // cluster, tight-loop doubles (the measured-5×-over-HOF path from
    // Embeddings), ascending-index summation so the DuckDB twin matches
    assigned.join(emb, "vec_id")
      .select($"list_id", $"vec_id", $"embedding")
      .as[(Int, Long, Array[Float])]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val members = it.toArray.sortBy(_._2)
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        var j = 1
        while (j < members.length) {
          val (_, idJ, ej) = members(j)
          var keeper = -1L
          var i = 0
          while (i < j && keeper < 0) {
            val (_, idI, ei) = members(i)
            var dot = 0.0; var na = 0.0; var nb = 0.0
            var d = 0
            while (d < ei.length) {
              val x = ei(d).toDouble; val y = ej(d).toDouble
              dot += x * y; na += x * x; nb += y * y
              d += 1
            }
            val cos = BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
            if (cos >= tau) keeper = idI
            i += 1
          }
          if (keeper >= 0) out += ((idJ, keeper))
          j += 1
        }
        out.iterator
      }
      .toDF("vec_id", "kept_by")
      .orderBy($"vec_id")
  }
}
