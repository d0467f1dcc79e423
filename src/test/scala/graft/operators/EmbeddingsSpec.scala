package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class EmbeddingsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  test("lshBuckets on mixed-dimension corpora: per-length matrices, partition-independent") {
    import spark.implicits._
    val rng = new java.util.Random(11)
    def vec(n: Int) = Array.fill(n)(rng.nextFloat() * 2 - 1)
    // lengths interleaved so any first-row-dictates-matrix bug surfaces
    val rows = (0L until 60L).map(i => (i, vec(if (i % 2 == 0) 4 else 8)))

    def buckets(parts: Int): Map[Long, Long] =
      Embeddings.lshBuckets(
        rows.toDF("vec_id", "embedding").repartition(parts), planes = 6)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val one = buckets(1)
    assert(one.size == 60)
    // partitioning must not change any bucket (r2 sized the matrix from the
    // partition's first row: longer vectors threw, shorter ones silently
    // bucketed with fewer dims, nondeterministically across partitionings)
    for (p <- Seq(3, 7, 16)) assert(buckets(p) == one, s"parts=$p changed buckets")

    // each bucket must equal a direct projection against the right-sized matrix
    val byId = rows.toMap
    one.foreach { case (id, b) =>
      val e = byId(id)
      val w = Embeddings.hyperplaneMatrix(6, e.length)
      var expect = 0L
      for (i <- 0 until 6) {
        val s = (0 until e.length).map(j => w(i)(j) * e(j).toDouble).sum
        if (s >= 0) expect |= 1L << i
      }
      assert(b == expect, s"vec $id (len ${e.length})")
    }
  }
}
