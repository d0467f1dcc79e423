package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Catalog

/** IVF (inverted-file) approximate nearest neighbor — the coarse-quantizer
  * scale path (the FAISS IVF-flat shape), complementing the LSH path
  * ([[Embeddings.annLshTopK]]):
  *
  *   - TRAIN: k-means centroids over a bounded, deterministic sample (the
  *     `sampleCap` lowest vec_ids), Lloyd iterations on the driver —
  *     exactly how FAISS trains its coarse quantizer offline. Deterministic
  *     end to end: sample, init (first k sample rows), iteration count, and
  *     tie-breaks are all fixed, so the centroid set is replayable.
  *   - ASSIGN: one narrow typed pass tags every vector with its nearest
  *     centroid (no shuffle — same plan shape as the LSH bucketing);
  *     the (vec_id, list_id) table persists once per corpus.
  *   - PROBE: the query vector picks its `nprobe` nearest centroids on the
  *     driver (k × dims floats), and only those lists' vectors get exact
  *     cosine — candidates ≈ nprobe/nlist of the corpus, never all of it.
  */
object Ivf {

  private def dist2(a: Array[Double], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Deterministic Lloyd core over an in-memory sample: first-k init, fixed
    * iteration count, strict-< tie-break (lowest index wins), empty cluster
    * keeps its centroid. Shared by the coarse quantizer here and the PQ
    * sub-codebook training ([[IvfPq]]); float inputs are widened to double
    * before any arithmetic, so extracting this core left
    * [[trainCentroids]]'s output bit-identical.
    */
  private[operators] def lloyd(sample: Array[Array[Double]], k: Int,
      iters: Int): Array[Array[Double]] = {
    require(sample.length >= k, s"need >= $k training vectors")
    val dims = sample.head.length
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0
      var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    var centroids = Array.tabulate(k)(i => sample(i).clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dims))
      val counts = new Array[Long](k)
      sample.foreach { v =>
        var best = 0
        var bd = Double.MaxValue
        var c = 0
        while (c < k) {
          val d = d2(centroids(c), v)
          if (d < bd) { bd = d; best = c } // strict <: lowest index wins ties
          c += 1
        }
        counts(best) += 1
        val s = sums(best)
        var j = 0
        while (j < dims) { s(j) += v(j); j += 1 }
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0) centroids(c) // empty list keeps its centroid
        else sums(c).map(_ / counts(c))
      }
    }
    centroids
  }

  /** The `sampleCap` lowest-id embedding vectors — the shared deterministic
    * training sample (the FAISS offline-train shape).
    */
  private[operators] def trainSample(spark: SparkSession, sfDir: String,
      sampleCap: Int): Array[Array[Float]] = {
    import spark.implicits._
    Catalog.readTable(spark, sfDir, "embeddings")
      .select($"vec_id".cast("long"), $"embedding")
      .as[(Long, Array[Float])]
      .orderBy($"vec_id")
      .limit(sampleCap)
      .collect().map(_._2)
  }

  /** Deterministic Lloyd k-means over the `sampleCap` lowest-id vectors. */
  def trainCentroids(spark: SparkSession, sfDir: String, nlist: Int,
      iters: Int = 5, sampleCap: Int = 4096): Array[Array[Double]] =
    lloyd(trainSample(spark, sfDir, sampleCap).map(_.map(_.toDouble)),
      nlist, iters)

  /** Assign every vector to its nearest centroid: one narrow pass. */
  def assignLists(emb: DataFrame, centroids: Array[Array[Double]]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(centroids)
    emb.select($"vec_id".cast("long"), $"embedding")
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = bc.value
        it.map { case (id, e) =>
          var best = 0
          var bd = Double.MaxValue
          var c = 0
          while (c < cs.length) {
            val d = dist2(cs(c), e)
            if (d < bd) { bd = d; best = c }
            c += 1
          }
          (id, best)
        }
      }
      .toDF("vec_id", "list_id")
  }

  /** Last recorded candidate set — (probeId, k, candidate vec_ids) — set by
    * [[annTopK]] when `record` is on. SparkEntry.oracleSql generates the
    * DuckDB oracle for `ann_ivf_topk` from it (exact cosine top-k restricted
    * to the engine's own deterministic candidate set — the same
    * generated-from-engine-state pattern as the percolate oracle): the
    * probe selection, list assignment, and re-scoring all become DuckDB-
    * checkable, with only the k-means training itself pinned by IvfSpec.
    */
  @volatile var lastOracle: Option[(Long, Int, Seq[Long])] = None

  /** IVF top-k cosine: scan only the probe's `nprobe` nearest lists.
    * `record` collects the (small: ≈ nprobe/nlist of the corpus) candidate
    * id set for oracle generation — off on the production path.
    */
  /** Last recorded candidate set of the FILTERED probe (post-predicate) —
    * the `ann_ivf_filtered` oracle input, same contract as [[lastOracle]].
    */
  @volatile var lastFilteredOracle: Option[(Long, Int, Int, Seq[Long])] = None

  /** Filtered IVF ANN (the ES `knn` + `filter` composition on the IVF scale
    * path): the metadata predicate lands INSIDE the probe — candidates are
    * the probed lists' vectors that ALSO pass `label = labelEq`, so the
    * exact re-scoring touches only the filtered intersection (pre-filtering,
    * never post-filtering a top-k that could starve below k; FAISS selector
    * masks / Lucene's filtered HNSW make the same choice). Both predicates
    * sit in scans: `list_id` prunes the persisted assignment table,
    * `label` prunes the embeddings scan the candidates join against.
    */
  def annTopKFiltered(spark: SparkSession, sfDir: String, probeId: Long,
      k: Int, centroids: Array[Array[Double]], nprobe: Int,
      listsPath: String, labelEq: Int, record: Boolean = false): DataFrame = {
    import spark.implicits._
    val emb = Catalog.readTable(spark, sfDir, "embeddings")
    val pe = emb.filter($"vec_id" === probeId)
      .select($"embedding").as[Array[Float]].head()
    val probeLists = centroids.zipWithIndex
      .map { case (c, i) => (dist2(c, pe), i) }
      .sortBy { case (d, i) => (d, i) }
      .take(nprobe).map(_._2)
    val dot = "aggregate(zip_with(embedding, pe, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    val n2 = "aggregate(zip_with(embedding, embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    val p2 = "aggregate(zip_with(pe, pe, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    val filtered = emb
      .filter($"label" === labelEq && $"vec_id" =!= probeId)
      .select($"vec_id", $"embedding")
    val cands = graft.io.Catalog.readParquet(spark, listsPath)
      .filter($"list_id".isin(probeLists.map(Integer.valueOf): _*))
      .select($"vec_id")
      .join(filtered, "vec_id") // predicate ∩ probe — both scan-pruned
    if (record)
      lastFilteredOracle = Some((probeId, k, labelEq,
        cands.select($"vec_id").as[Long].collect().sorted.toIndexedSeq))
    cands
      .join(broadcast(emb.filter($"vec_id" === probeId).select($"embedding".as("pe"))))
      .select($"vec_id",
        round(expr(dot) / (sqrt(expr(n2)) * sqrt(expr(p2))), 6).as("cos_r6"))
      .orderBy($"cos_r6".desc, $"vec_id".asc)
      .limit(k)
  }

  def annTopK(spark: SparkSession, sfDir: String, probeId: Long, k: Int,
      centroids: Array[Array[Double]], nprobe: Int,
      listsPath: String, record: Boolean = false): DataFrame = {
    import spark.implicits._
    val emb = Catalog.readTable(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding")
    val pe = emb.filter($"vec_id" === probeId)
      .select($"embedding").as[Array[Float]].head()
    val probeLists = centroids.zipWithIndex
      .map { case (c, i) => (dist2(c, pe), i) }
      .sortBy { case (d, i) => (d, i) }
      .take(nprobe).map(_._2)
    val dot = "aggregate(zip_with(embedding, pe, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    val n2 = "aggregate(zip_with(embedding, embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    val p2 = "aggregate(zip_with(pe, pe, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    val cands = graft.io.Catalog.readParquet(spark, listsPath)
      .filter($"list_id".isin(probeLists.map(Integer.valueOf): _*)) // pushed to the scan
      .select($"vec_id")
    if (record)
      lastOracle = Some((probeId, k,
        cands.as[Long].collect().sorted.toIndexedSeq))
    emb.join(cands, "vec_id")
      .filter($"vec_id" =!= probeId)
      .join(broadcast(emb.filter($"vec_id" === probeId).select($"embedding".as("pe"))))
      .select($"vec_id",
        round(expr(dot) / (sqrt(expr(n2)) * sqrt(expr(p2))), 6).as("cos_r6"))
      .orderBy($"cos_r6".desc, $"vec_id".asc)
      .limit(k)
  }
}
