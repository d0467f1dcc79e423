package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.{IndexCache, TestSpark}
import graft.io.Catalog

class IvfPqSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  lazy val sfDir = "/root/testdata/sf0.001"

  test("training is deterministic and the codebook layout is well-formed") {
    val a = IvfPq.train(spark, sfDir, nlist = 8, m = 8, ks = 16)
    val b = IvfPq.train(spark, sfDir, nlist = 8, m = 8, ks = 16)
    assert(a.centroids.map(_.toSeq).toSeq == b.centroids.map(_.toSeq).toSeq)
    assert(a.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      b.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    assert(a.codebooks.length == 8 && a.codebooks.forall(_.length == 16))
    assert(a.subDim * a.m == 64)
  }

  test("coarse assignment of PQ encode matches flat IVF's list assignment") {
    import spark.implicits._
    val (model, codesPath) = IndexCache.ivfPq(spark, sfDir)
    val (_, flatPath) = IndexCache.ivf(spark, sfDir)
    val pq = spark.read.parquet(codesPath)
      .select($"vec_id".cast("long"), $"list_id".cast("int"))
      .as[(Long, Int)].collect().toMap
    val flat = spark.read.parquet(flatPath)
      .select($"vec_id".cast("long"), $"list_id".cast("int"))
      .as[(Long, Int)].collect().toMap
    assert(pq == flat, "same centroids, same deterministic assignment")
    // codes are within [0, ks); norms positive
    val rows = spark.read.parquet(codesPath)
      .select($"codes", $"norm").as[(Array[Byte], Double)].collect()
    assert(rows.forall { case (c, n) =>
      c.length == model.m && c.forall(b => (b & 0xff) < model.ks) && n > 0.0
    })
  }

  test("ADC + refine recall@10 is competitive with flat IVF at equal nprobe") {
    import spark.implicits._
    val (model, codesPath) = IndexCache.ivfPq(spark, sfDir)
    val (centroids, listsPath) = IndexCache.ivf(spark, sfDir)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select($"vec_id".cast("long")).as[Long].collect().toSet
    val exact = ids(Embeddings.cosineTopK(spark, sfDir, 0L, 10))
    val flat = ids(Ivf.annTopK(spark, sfDir, 0L, 10, centroids, 4, listsPath))
    val pq = ids(IvfPq.annTopK(spark, sfDir, 0L, 10, model, nprobe = 4,
      shortlist = 50, codesPath = codesPath))
    val recallFlat = flat.intersect(exact).size / 10.0
    val recallPq = pq.intersect(exact).size / 10.0
    info(s"recall@10 exact-candidates(flat IVF)=$recallFlat ADC+refine(PQ)=$recallPq")
    // PQ can only lose candidates the ADC shortlist misses; with a 50-deep
    // shortlist over near-uniform embeddings it must stay within 0.3 of flat
    assert(recallPq >= recallFlat - 0.3,
      s"PQ recall $recallPq collapsed vs flat $recallFlat")
    assert(recallPq >= 0.4, s"PQ recall floor: $recallPq")
    // the refine contract: every returned hit is among the probed lists'
    // vectors and scored by EXACT cosine (subset of flat's candidate space)
    assert(pq.subsetOf(ids(spark.read.parquet(codesPath).select($"vec_id"))))
  }

  test("payload compression: codes bytes are a fraction of the flat vectors") {
    val (_, codesPath) = IndexCache.ivfPq(spark, sfDir)
    import spark.implicits._
    val n = spark.read.parquet(codesPath).count()
    // logical payload per vector: m bytes + 8-byte norm vs 64 × 4-byte floats
    val logicalPq = n * (8 + 8).toDouble
    val logicalFlat = n * (64 * 4).toDouble
    assert(logicalPq / logicalFlat < 0.1,
      "PQ logical payload must be <10% of flat vectors")
  }
}
