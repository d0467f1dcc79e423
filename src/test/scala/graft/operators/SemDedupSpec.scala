package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.io.Catalog

/** SemDeDup (cluster-bounded semantic near-dup marking) against a local
  * brute recomputation from the SAME deterministic cluster assignment.
  */
class SemDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  private val dir = "/root/testdata/sf0.001"
  private val tau = 0.4

  test("semanticDups equals the local within-cluster keep-the-first fold") {
    import spark.implicits._
    val got = SemDedup.semanticDups(spark, dir, tau, nClusters = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    val centroids = Ivf.trainCentroids(spark, dir, 8)
    val emb = Catalog.readTable(spark, dir, "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().toMap
    val byCluster = Ivf.assignLists(
      Catalog.readTable(spark, dir, "embeddings").select($"vec_id", $"embedding"),
      centroids).as[(Long, Int)].collect().groupBy(_._2)

    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }

    val want = byCluster.values.flatMap { members =>
      val ids = members.map(_._1).sorted
      ids.flatMap { j =>
        ids.filter(_ < j).find(i => cos(emb(i), emb(j)) >= tau).map(i => (j, i))
      }
    }.toSeq.sortBy(_._1)

    assert(got == want)
    assert(got.nonEmpty, "fixture should contain semantic near-dups at tau=0.4")
  }

  test("reported pairs are genuine: same cluster, lower keeper, cosine >= tau") {
    import spark.implicits._
    val got = SemDedup.semanticDups(spark, dir, tau, nClusters = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val emb = Catalog.readTable(spark, dir, "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().toMap
    got.foreach { case (dup, keeper) =>
      assert(keeper < dup)
      val (a, b) = (emb(keeper), emb(dup))
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      assert(dot / (math.sqrt(na) * math.sqrt(nb)) >= tau - 1e-6)
    }
  }
}
