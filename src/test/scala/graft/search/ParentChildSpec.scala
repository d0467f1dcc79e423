package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.{IndexCache, TestSpark}

/** ES parent-join family over the derived join key (parent = doc_id DIV 10)
  * against brute-force recomputation on the sf0.001 documents corpus. The
  * DuckDB driver oracle re-checks the same queries end-to-end; this spec
  * pins the semantics (score modes, min_children, inner-hit ranking)
  * in-repo.
  */
class ParentChildSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  private val dir = "/root/testdata/sf0.001"
  private val q = Seq("join", "window", "vector")

  private lazy val root = IndexCache.documentsIndex(spark, dir).paths.root

  private def map: DataFrame = {
    import spark.implicits._
    graft.io.Catalog.readTable(spark, dir, "documents")
      .selectExpr("doc_id", "doc_id DIV 10 AS parent")
  }

  /** (parent → all matching child (doc_id, score)) via the exhaustive scorer. */
  private lazy val brute: Map[Long, Seq[(Long, Double)]] =
    SearchEngine.scoreAllDocs(spark, root, q)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .groupBy(_._1 / 10).view.mapValues(_.toSeq.sortBy(t => (-t._2, t._1))).toMap

  private def r4(x: Double): Double = math.rint(x * 1e4) / 1e4

  test("has_child score_mode=max matches brute grouping") {
    val got = ParentChild.hasChildMax(spark, root, map, q, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = brute.view.mapValues(_.map(_._2).max).toSeq
      .sortBy { case (p, s) => (-s, p) }.take(10)
      .map { case (p, s) => (p, r4(s)) }
    assert(got == want)
  }

  test("has_child score_mode=sum honors min_children and sums all matches") {
    val got = ParentChild.hasChildSum(spark, root, map, q, 10, minChildren = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    val want = brute.view.filter(_._2.size >= 2)
      .mapValues(cs => (cs.map(_._2).sum, cs.size.toLong)).toSeq
      .sortBy { case (p, (s, _)) => (-s, p) }.take(10)
      .map { case (p, (s, n)) => (p, r4(s), n) }
    assert(got.map(t => (t._1, t._3)) == want.map(t => (t._1, t._3)))
    got.zip(want).foreach { case ((_, g, _), (_, w, _)) =>
      assert(math.abs(g - w) < 2e-4, "sum-mode 4dp with summation-order slack")
    }
  }

  test("has_parent returns exactly the children of matching groups") {
    import spark.implicits._
    val got = ParentChild.hasParent(spark, root, map, Seq("dup"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val docs = graft.io.Catalog.readTable(spark, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val matchingParents = docs.filter { case (_, t) =>
      graft.core.Analyzer.tokenize(t).contains("dup")
    }.map(_._1 / 10).toSet
    val want = docs.map(_._1).filter(d => matchingParents(d / 10)).sorted
      .map(d => (d, d / 10)).toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("parent_id returns exactly one group's children") {
    val got = ParentChild.parentId(spark, map, 42L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == (420L to 429L).map(d => (d, 42L)))
  }

  test("pinned query: pins first in given order, organic fill excludes pins") {
    val pins = Seq(420L, 7L, 159L)
    val got = Hybrid.pinnedTopK(spark, root, pins, q, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got.take(3) == pins.zipWithIndex.map { case (d, i) => (i + 1L, d, true) })
    val organicIds = got.drop(3).map(_._2)
    assert(got.size == 10 && organicIds.intersect(pins).isEmpty)
    val wand = SearchEngine.topKWand(spark, root, q, 13)
      .collect().map(_.getLong(0)).filterNot(pins.contains).take(7).toSeq
    assert(organicIds == wand)
  }

  test("inner_hits ranks each top parent's children (score desc, doc_id asc)") {
    val got = ParentChild.innerHits(spark, root, map, q, kParents = 5, nPer = 3)
      .collect().map(r =>
        (r.getLong(0), r.getDouble(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
      .toSeq
    val parents = brute.view.mapValues(_.map(_._2).max).toSeq
      .sortBy { case (p, s) => (-s, p) }.take(5)
    val want = parents.flatMap { case (p, ps) =>
      brute(p).take(3).zipWithIndex.map { case ((d, s), i) =>
        (p, r4(ps), d, r4(s), i + 1L)
      }
    }
    assert(got == want)
    assert(got.size == want.size && got.nonEmpty)
  }
}
