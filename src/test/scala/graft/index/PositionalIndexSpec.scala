package graft.index

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.{IndexCache, TestSpark}
import graft.operators.Phrase

/** Index-backed phrase matching must equal the relational positional-join
  * twin (which is itself DuckDB-oracled) on every phrase shape.
  */
class PositionalIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  private val sfDir = "/root/testdata/sf0.001"

  private def docIds(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.collect().map(_.getLong(0)).toSeq

  test("index phrase match equals relational phrase match") {
    val idx = IndexCache.positionalIndex(spark, sfDir)
    val phrases = Seq(
      Seq("join", "hash"),
      Seq("the", "a"),
      Seq("join", "join"),            // repeated term
      Seq("window", "stream", "row"), // 3-term
      Seq("zebra", "join"),           // absent first term -> empty
      Seq("join"))                    // single term == containment
    for (p <- phrases) {
      val viaIndex = docIds(PositionalIndex.phraseMatch(spark, idx.paths.root, p, idx.meta.buckets))
      val viaJoin = docIds(Phrase.phraseMatch(spark, sfDir, p))
      assert(viaIndex == viaJoin, s"phrase $p mismatch")
    }
  }

  test("scored phrase top-k equals the relational brute twin") {
    val idx = IndexCache.positionalIndex(spark, sfDir)
    val phrases = Seq(
      Seq("join", "hash"),
      Seq("the", "a"),
      Seq("window", "stream", "row"),
      Seq("zebra", "join"), // no match -> empty
      Seq("join"))          // single term: ptf == tf
    for (p <- phrases; k <- Seq(3, 10)) {
      val viaIndex = PositionalIndex.phraseTopK(spark, idx.paths.root, p, k, idx.meta.buckets)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val brute = Phrase.phraseTopKBrute(spark, sfDir, p, k)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(viaIndex == brute, s"phrase $p k=$k: index=$viaIndex brute=$brute")
    }
  }

  test("match_phrase_prefix equals corpus brute force; honors max_expansions") {
    import spark.implicits._
    val idx = IndexCache.positionalIndex(spark, sfDir)
    val docs = graft.io.Catalog.readDocuments(spark, sfDir).collect()
    def brute(lead: Seq[String], prefix: String,
        allowed: String => Boolean = _ => true): Seq[Long] =
      docs.filter { d =>
        val t = graft.core.Analyzer.tokenize(d.text)
        t.indices.exists { i =>
          i + lead.length < t.length &&
          lead.indices.forall(j => t(i + j) == lead(j)) &&
          t(i + lead.length).startsWith(prefix) && allowed(t(i + lead.length))
        }
      }.map(_.doc_id).sorted.toSeq
    for ((lead, pre) <- Seq((Seq("join"), "h"), (Seq("join", "hash"), "s"),
        (Seq("window"), "a"), (Seq("join"), "zzz"))) {
      val got = graft.index.PositionalIndex.phrasePrefixMatch(
        spark, idx.paths.root, lead, pre, idx.meta.buckets)
        .as[Long].collect().toSeq
      assert(got == brute(lead, pre), s"phrase_prefix lead=$lead pre=$pre")
    }
    // cap: maxExpansions=1 keeps only the lexicographically first expansion
    val firstH = graft.io.Catalog
      .readDictionary(spark, graft.io.Catalog.IndexPaths(idx.paths.root))
      .toDF().filter($"term".startsWith("h")).orderBy($"term")
      .limit(1).collect().head.getString(0)
    val capped = graft.index.PositionalIndex.phrasePrefixMatch(
      spark, idx.paths.root, Seq("join"), "h", idx.meta.buckets, maxExpansions = 1)
      .as[Long].collect().toSeq
    assert(capped == brute(Seq("join"), "h", _ == firstH),
      "max_expansions must cap in term order")
  }

  test("positional block roundtrip") {
    import spark.implicits._
    val blocks = spark.read.parquet(PositionalIndex.pathOf(
        IndexCache.positionalIndex(spark, sfDir).paths.root))
      .select("term", "bucket", "run_id", "block_idx", "first_doc", "last_doc",
        "n_docs", "doc_deltas_vb", "pos_lens_vb", "pos_deltas_vb")
      .as[PosBlock].take(50)
    assert(blocks.nonEmpty)
    blocks.foreach { b =>
      val entries = PositionalIndex.decode(b).toSeq
      assert(entries.size == b.n_docs)
      assert(entries.head._1 == b.first_doc && entries.last._1 == b.last_doc)
      entries.foreach { case (_, ps) =>
        assert(ps.nonEmpty && ps.sameElements(ps.sorted))
      }
    }
  }
}
