package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.{IndexCache, TestSpark}
import graft.io.Catalog

class IvfSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  private val sfDir = "/root/testdata/sf0.001"

  test("training is deterministic and assignment is partition-independent") {
    import spark.implicits._
    val c1 = Ivf.trainCentroids(spark, sfDir, 8)
    val c2 = Ivf.trainCentroids(spark, sfDir, 8)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    val emb = Catalog.readTable(spark, sfDir, "embeddings")
    val a1 = Ivf.assignLists(emb, c1)
      .as[(Long, Int)].collect().sortBy(_._1).toSeq
    val a2 = Ivf.assignLists(emb.repartition(7), c1)
      .as[(Long, Int)].collect().sortBy(_._1).toSeq
    assert(a1 == a2)
    assert(a1.map(_._2).distinct.size > 1, "vectors must spread over lists")
  }

  test("IVF top-k equals exact cosine restricted to the probed lists; recall measured") {
    import spark.implicits._
    val (centroids, listsPath) = IndexCache.ivf(spark, sfDir, nlist = 8)
    val lists = spark.read.parquet(listsPath)
      .as[(Long, Int)].collect().toMap
    val embAll = Catalog.readTable(spark, sfDir, "embeddings")
      .select($"vec_id".cast("long"), $"embedding")
      .as[(Long, Array[Float])].collect().toMap

    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }

    var recallSum = 0.0
    val probes = Seq(0L, 7L, 42L, 99L, 123L)
    for (p <- probes) {
      val pe = embAll(p)
      val nearLists = centroids.zipWithIndex
        .map { case (c, i) =>
          var s = 0.0; var j = 0
          while (j < c.length) { val d = c(j) - pe(j); s += d * d; j += 1 }
          (s, i)
        }
        .sortBy { case (d, i) => (d, i) }.take(4).map(_._2).toSet
      val got = Ivf.annTopK(spark, sfDir, p, 10, centroids, 4, listsPath)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val want = embAll.toSeq
        .filter { case (id, _) => id != p && nearLists.contains(lists(id)) }
        .map { case (id, e) => (id, math.rint(cos(e, pe) * 1e6) / 1e6) }
        .sortBy { case (id, c) => (-c, id) }.take(10)
      assert(got == want, s"probe $p: IVF must be exact over its candidate lists")

      val exact = embAll.toSeq.filter(_._1 != p)
        .map { case (id, e) => (id, cos(e, pe)) }
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
      recallSum += got.map(_._1).count(exact.contains) / 10.0
    }
    val recall = recallSum / probes.size
    info(f"IVF recall@10 (nlist=8, nprobe=4, near-uniform corpus): $recall%.2f")
    assert(recall > 0.0)
  }

  test("filtered IVF equals exact cosine over probed-lists ∩ label stratum") {
    import spark.implicits._
    val (centroids, listsPath) = IndexCache.ivf(spark, sfDir)
    val emb = Catalog.readTable(spark, sfDir, "embeddings")
      .select($"vec_id".cast("long"), $"embedding", $"label")
      .as[(Long, Array[Float], Int)].collect()
    val byId = emb.map(t => t._1 -> t).toMap
    val lists = spark.read.parquet(listsPath)
      .as[(Long, Int)].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    for (p <- Seq(0L, 42L); lbl <- Seq(3, 7)) {
      val pe = byId(p)._2
      val nearLists = centroids.zipWithIndex
        .map { case (c, i) =>
          var s = 0.0; var j = 0
          while (j < c.length) { val d = c(j) - pe(j); s += d * d; j += 1 }
          (s, i)
        }
        .sortBy { case (d, i) => (d, i) }.take(4).map(_._2).toSet
      val got = Ivf.annTopKFiltered(spark, sfDir, p, 10, centroids, 4,
          listsPath, labelEq = lbl)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val want = emb.toSeq
        .filter { case (id, _, l) => id != p && l == lbl && nearLists.contains(lists(id)) }
        .map { case (id, e, _) => (id, math.rint(cos(e, pe) * 1e6) / 1e6) }
        .sortBy { case (id, c) => (-c, id) }.take(10)
      assert(got == want, s"probe=$p label=$lbl")
      assert(got.nonEmpty)
      got.foreach { case (id, _) => assert(byId(id)._3 == lbl) }
    }
  }
}
