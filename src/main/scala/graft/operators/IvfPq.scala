package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Catalog

/** IVF-PQ — product-quantized residual compression over the IVF coarse
  * quantizer (the FAISS `IVFx,PQm` shape with exact refine): at 100 TB the
  * flat IVF lists' full vectors dominate memory; PQ stores M one-byte codes
  * per vector instead of D floats (here 64 floats → 8 bytes + 1 norm,
  * a 32× payload cut).
  *
  *  - TRAIN (driver, deterministic — the same bounded lowest-id sample and
  *    Lloyd core as [[Ivf]]): coarse centroids first, then ONE shared PQ
  *    codebook over coarse residuals (r = v − c_list), split into M
  *    subspaces of D/M dims with `ks` centroids each (FAISS's default
  *    shared-codebook layout).
  *  - ENCODE (one narrow typed pass, no shuffle): per vector — nearest
  *    coarse list, per-subspace nearest codebook entry on the residual,
  *    exact ‖v‖ stored (cosine needs the true norm; 8 more bytes). Sink is
  *    partitioned by list_id, so probes prune at the scan.
  *  - PROBE (ADC + refine): the query picks `nprobe` lists on the driver;
  *    one M×ks lookup table of ⟨q_sub, codebook⟩ dots is built per query
  *    (independent of list — the codebook is shared), and every candidate's
  *    approximate cosine is table lookups + ⟨q, c_list⟩, never a vector
  *    decode. The ADC top-`shortlist` then re-ranks with exact cosine
  *    against the stored vectors (FAISS refine): only `shortlist` full
  *    vectors are ever read. The final top-k is therefore exact over the
  *    ADC candidate set — which is what the generated oracle checks (the
  *    [[Ivf.lastOracle]] candidate-set pattern).
  */
object IvfPq {

  final case class Model(
      centroids: Array[Array[Double]], // nlist coarse centroids
      codebooks: Array[Array[Array[Double]]], // M × ks × subDim
      m: Int, ks: Int, subDim: Int) {
    def nlist: Int = centroids.length
  }

  private def dist2(a: Array[Double], b: Array[Double], aOff: Int): Double = {
    var s = 0.0
    var i = 0
    while (i < b.length) { val d = a(aOff + i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Coarse + PQ training over the shared deterministic sample. */
  def train(spark: SparkSession, sfDir: String, nlist: Int, m: Int,
      ks: Int = 16, iters: Int = 5, sampleCap: Int = 4096): Model = {
    val sample = Ivf.trainSample(spark, sfDir, sampleCap).map(_.map(_.toDouble))
    val dims = sample.head.length
    require(dims % m == 0, s"dims $dims must divide into $m subspaces")
    val subDim = dims / m
    val centroids = Ivf.lloyd(sample, nlist, iters)
    // coarse residuals of the SAME sample feed the PQ codebooks
    val residuals = sample.map { v =>
      var best = 0
      var bd = Double.MaxValue
      var c = 0
      while (c < nlist) {
        val d = dist2(v, centroids(c), 0)
        if (d < bd) { bd = d; best = c }
        c += 1
      }
      val r = new Array[Double](dims)
      var j = 0
      while (j < dims) { r(j) = v(j) - centroids(best)(j); j += 1 }
      r
    }
    val codebooks = Array.tabulate(m) { sub =>
      val subSample = residuals.map(r =>
        java.util.Arrays.copyOfRange(r, sub * subDim, (sub + 1) * subDim))
      Ivf.lloyd(subSample, ks, iters)
    }
    Model(centroids, codebooks, m, ks, subDim)
  }

  /** One narrow pass: (vec_id, list_id, codes[M] bytes, norm). */
  def encode(emb: DataFrame, model: Model): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    emb.select($"vec_id".cast("long"), $"embedding")
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val md = bc.value
        it.map { case (id, e) =>
          val v = new Array[Double](e.length)
          var i = 0
          var n2 = 0.0
          while (i < e.length) {
            v(i) = e(i).toDouble; n2 += v(i) * v(i); i += 1
          }
          var best = 0
          var bd = Double.MaxValue
          var c = 0
          while (c < md.nlist) {
            val d = dist2(v, md.centroids(c), 0)
            if (d < bd) { bd = d; best = c }
            c += 1
          }
          val cent = md.centroids(best)
          val codes = new Array[Byte](md.m)
          var sub = 0
          while (sub < md.m) {
            val off = sub * md.subDim
            val book = md.codebooks(sub)
            var bi = 0
            var bdd = Double.MaxValue
            var j = 0
            while (j < md.ks) {
              // residual sub-vector vs codebook entry, allocation-free
              var s = 0.0
              var t = 0
              val e2 = book(j)
              while (t < md.subDim) {
                val d = (v(off + t) - cent(off + t)) - e2(t)
                s += d * d
                t += 1
              }
              if (s < bdd) { bdd = s; bi = j }
              j += 1
            }
            codes(sub) = bi.toByte
            sub += 1
          }
          (id, best, codes, math.sqrt(n2))
        }
      }
      .toDF("vec_id", "list_id", "codes", "norm")
  }

  /** Last recorded ADC shortlist — (probeId, k, candidate vec_ids) — the
    * generated-oracle hook (same contract as [[Ivf.lastOracle]]: the final
    * answer is the exact cosine top-k restricted to this set, which DuckDB
    * recomputes independently).
    */
  @volatile var lastOracle: Option[(Long, Int, Seq[Long])] = None

  def annTopK(spark: SparkSession, sfDir: String, probeId: Long, k: Int,
      model: Model, nprobe: Int, shortlist: Int, codesPath: String,
      record: Boolean = false): DataFrame = {
    import spark.implicits._
    require(shortlist >= k, "refine shortlist must cover k")
    val emb = Catalog.readTable(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding")
    val pe = emb.filter($"vec_id" === probeId)
      .select($"embedding").as[Array[Float]].head()
    val q = pe.map(_.toDouble)
    var qn2 = 0.0
    q.foreach(x => qn2 += x * x)
    val qNorm = math.sqrt(qn2)
    // nprobe nearest coarse lists + per-list <q, c> offsets (driver, tiny)
    val byList = model.centroids.zipWithIndex.map { case (c, i) =>
      var d = 0.0
      var dot = 0.0
      var j = 0
      while (j < q.length) {
        val diff = q(j) - c(j); d += diff * diff; dot += q(j) * c(j); j += 1
      }
      (d, i, dot)
    }
    val probed = byList.sortBy { case (d, i, _) => (d, i) }.take(nprobe)
    val probeLists = probed.map(_._2)
    val qcDot = {
      val a = new Array[Double](model.nlist)
      probed.foreach { case (_, i, dot) => a(i) = dot }
      a
    }
    // the ADC table: <q_sub, codebook[m][j]> — M×ks doubles per QUERY
    val table = Array.tabulate(model.m, model.ks) { (sub, j) =>
      val off = sub * model.subDim
      val e = model.codebooks(sub)(j)
      var s = 0.0
      var t = 0
      while (t < model.subDim) { s += q(off + t) * e(t); t += 1 }
      s
    }
    val bcTable = spark.sparkContext.broadcast(table)
    val bcQc = spark.sparkContext.broadcast(qcDot)
    val adc = graft.io.Catalog.readParquet(spark, codesPath)
      .filter($"list_id".isin(probeLists.map(Integer.valueOf): _*)) // scan prune
      .filter($"vec_id" =!= probeId)
      .select($"vec_id".cast("long"), $"list_id", $"codes", $"norm")
      .as[(Long, Int, Array[Byte], Double)]
      .mapPartitions { it =>
        val tab = bcTable.value
        val qc = bcQc.value
        it.map { case (id, list, codes, norm) =>
          var s = qc(list)
          var sub = 0
          while (sub < codes.length) {
            s += tab(sub)(codes(sub) & 0xff)
            sub += 1
          }
          (id, s / (norm * qNorm))
        }
      }
      .toDF("vec_id", "adc_cos")
      .orderBy($"adc_cos".desc, $"vec_id".asc)
      .limit(shortlist)
    val candIds = adc.select($"vec_id").as[Long].collect().sorted
    if (record) lastOracle = Some((probeId, k, candIds.toIndexedSeq))
    // refine: exact cosine over the shortlist only (vec_id pushed to scan)
    val dot = "aggregate(zip_with(embedding, pe, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    val n2 = "aggregate(zip_with(embedding, embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    val p2 = "aggregate(zip_with(pe, pe, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    emb.filter($"vec_id".isin(candIds.map(java.lang.Long.valueOf): _*))
      .join(broadcast(emb.filter($"vec_id" === probeId).select($"embedding".as("pe"))))
      .select($"vec_id",
        round(expr(dot) / (sqrt(expr(n2)) * sqrt(expr(p2))), 6).as("cos_r6"))
      .orderBy($"cos_r6".desc, $"vec_id".asc)
      .limit(k)
  }
}
