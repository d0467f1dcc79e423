package graft.operators

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Dedup canonicalization (connected components) + the head-shingle df-cap
  * guard on the exact Jaccard path.
  */
class DedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  private def tmp(name: String) =
    s"/tmp/graft-test-${name}-${java.util.UUID.randomUUID().toString.take(8)}"

  test("3-doc chain (A~B, B~C, A!~C) collapses into one cluster") {
    import spark.implicits._
    // A=1, B=2, C=3 chained; {10, 11} separate; edge (2,1) reversed on purpose
    val pairs = Seq((2L, 1L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val out = Dedup.connectedComponents(pairs, tmp("cc")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (10L, 10L, 2L), (11L, 10L, 2L)))
  }

  test("long chain converges (diameter > 1 round)") {
    import spark.implicits._
    val pairs = (0L until 9L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val out = Dedup.connectedComponents(pairs, tmp("chain")).collect()
    assert(out.length == 10)
    assert(out.forall(r => r.getLong(1) == 0L && r.getLong(2) == 10L))
  }

  test("empty pair set yields empty clusters") {
    import spark.implicits._
    val pairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.connectedComponents(pairs, tmp("empty")).collect().isEmpty)
  }

  test("connected components leaves no persisted blocks behind") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Dedup.connectedComponents(pairs, tmp("nopersist")).collect()
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert(after == before, s"leaked RDD ids: ${after -- before}")
  }

  test("substring dedup: exact span bounds, threshold, and dup_of on a constructed corpus") {
    import spark.implicits._
    val shared = (1 to 12).map(i => s"s$i").mkString(" ") // the duplicated span
    val short6 = (1 to 6).map(i => s"t$i").mkString(" ")  // below minTokens
    val docs = Seq(
      (0L, s"u0a u0b u0c $shared u0d u0e", "en", "src1", 0L),
      (1L, s"v0a v0b $shared v0c", "en", "src1", 0L),
      (2L, "w0a w0b w0c w0d w0e w0f w0g w0h w0i w0j w0k w0l w0m", "en", "src1", 0L),
      (3L, s"x0a $short6 x0b x0c x0d x0e x0f", "en", "src1", 0L),
      (4L, s"y0a y0b $short6 y0c y0d y0e", "en", "src1", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmp("substr")
    docs.write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")

    val got = Dedup.substringDups(spark, dir, minTokens = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 0: span at tokens 3..14 (12 tokens), duplicated with doc 1;
    // doc 1: same span at tokens 2..13; doc 2 unique; docs 3/4 share only a
    // 6-token span — below the threshold, no row
    assert(got.toSeq == Seq((0L, 3L, 14L, 1L), (1L, 2L, 13L, 0L)), got.toSeq.toString)

    // threshold edge: at minTokens = 6 the short span appears with exact bounds
    val loose = Dedup.substringDups(spark, dir, minTokens = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(loose.contains((3L, 1L, 6L, 4L)) && loose.contains((4L, 2L, 7L, 3L)),
      loose.toSeq.toString)
  }

  test("shingle df-cap drops hot-shingle pairs; high cap keeps them") {
    import spark.implicits._
    // doc 0 and 1 are identical "a b c" (single shingle a_b_c);
    // docs 2..6 each contain a_b_c too => df(a_b_c) = 7
    val docs = (Seq((0L, "a b c"), (1L, "a b c")) ++
        (2L to 6L).map(i => (i, s"a b c x$i")))
      .toDF("doc_id", "text")
    val dir = tmp("cap")
    docs.write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")

    val loose = Dedup.ngramJaccardPairs(spark, dir, 0.5, maxShingleDf = 1000L)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(loose.contains((0L, 1L)) && loose.length > 1)

    val capped = Dedup.ngramJaccardPairs(spark, dir, 0.5, maxShingleDf = 5L)
      .collect()
    assert(capped.isEmpty, s"hot shingle must be dropped, got ${capped.toSeq}")
  }
}
