package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property check: the DataFrame min-label propagation must agree with a
  * driver-side union-find on random graphs — chains, stars, cliques, forests
  * of mixed shapes, self-contained components with non-minimal edge order.
  * Case count is kept small (each Spark run materializes per-round parquet),
  * but shapes are seeded-random and adversarial (long paths stress the
  * round-count logic; shuffled labels stress min-propagation direction).
  */
class ConnectedComponentsProps extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  private def unionFind(n: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long](n.map(x => x -> x): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    n.map(x => x -> find(x)).toMap
  }

  test("min-label propagation agrees with union-find on random graphs") {
    import spark.implicits._
    val rng = new scala.util.Random(20260816L)
    for (case_ <- 1 to 10) {
      val nNodes = 4 + rng.nextInt(30)
      val nodes = rng.shuffle((0L until 100L).toList).take(nNodes) // sparse ids
      val nEdges = 1 + rng.nextInt(nNodes * 2)
      val edges = Seq.fill(nEdges) {
        val a = nodes(rng.nextInt(nodes.length))
        var b = nodes(rng.nextInt(nodes.length))
        while (b == a) b = nodes(rng.nextInt(nodes.length))
        (math.max(a, b), math.min(a, b)) // non-minimal order on purpose
      }.distinct
      // a guaranteed long path to stress multi-round convergence
      val path = nodes.sorted.takeRight(math.min(8, nodes.length))
        .sliding(2).collect { case Seq(a, b) => (b, a) }.toSeq
      val all = (edges ++ path).distinct

      val got = Dedup.connectedComponents(
        all.toDF("doc_a", "doc_b"),
        s"/tmp/graft-ccprop-$case_-${System.nanoTime()}")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      val inGraph = all.flatMap(e => Seq(e._1, e._2)).distinct
      val expected = unionFind(inGraph, all)
      assert(got == expected, s"case $case_: edges=$all")

      // cluster_size consistency: |members per canonical| must match
      val sizes = Dedup.connectedComponents(
        all.toDF("doc_a", "doc_b"),
        s"/tmp/graft-ccprop-sz-$case_-${System.nanoTime()}")
        .collect().map(r => (r.getLong(1), r.getLong(2)))
      sizes.groupBy(_._1).foreach { case (canon, rows) =>
        assert(rows.forall(_._2 == rows.length.toLong),
          s"case $case_: cluster_size mismatch for canonical $canon")
      }
    }
  }
}
