package graft.search

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.{IndexCache, TestSpark}
import graft.core.Analyzer
import graft.io.Catalog

/** Round-5 additions: phrase suggester (bigram-LM rerank), _rank_eval,
  * adjacency_matrix, bucket_selector+bucket_sort.
  */
class SuggestRankEvalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  private val sfDir = "/root/testdata/sf0.001"

  test("phrase suggester: bigram evidence ranks the real phrase first") {
    val idx = IndexCache.bigramIndex(spark, sfDir)
    val got = Suggest.phrase(spark, idx.paths.root,
        Seq("jion", "hash"), 5, maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(got.nonEmpty)
    // 'join hash' is a frequent corpus bigram; any competing candidate pair
    // shares the unigram stats but not the bigram mass
    assert(got.head._1 == "join" && got.head._2 == "hash", got.toSeq.toString)
    // scores strictly ordered desc and all negative (log-probs)
    assert(got.sliding(2).forall {
      case Array(a, b) => a._3 >= b._3
      case _ => true
    })
    assert(got.forall(_._3 < 0.0))
  }

  test("completion suggester: context-scoped prefix top-n from the artifact, filters pushed") {
    val path = IndexCache.completionPath(spark, sfDir)
    val df = Suggest.completion(spark, path, "s", "src1", 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("StartsWith"),
      s"prefix + context must be pushed into the artifact scan:\n$plan")
    assert(!plan.contains("documents.parquet"),
      s"completion probe must not scan the corpus:\n$plan")
    val got = df.collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.length == 5 && got.forall(_._1.startsWith("s")))
    // ranked by df desc then term asc
    assert(got.sliding(2).forall {
      case Array(a, b) => a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)
      case _ => true
    }, got.toSeq.toString)
    // context scoping: recompute src1's df for the top term locally
    val (top, topDf) = got.head
    val want = Catalog.readTable(spark, sfDir, "documents")
      .select("source", "text").collect()
      .count(r => r.getString(0) == "src1" &&
        Analyzer.tokenize(r.getString(1)).contains(top))
    assert(topDf == want.toLong, s"df($top) = $topDf vs $want")
  }

  test("rank_eval metrics match an independent local recomputation") {
    val idx = IndexCache.documentsIndex(spark, sfDir)
    val k = 10

    def recompute(q: Seq[String], judge: Seq[String]): (Double, Double, Double) = {
      val rel = Catalog.readTable(spark, sfDir, "documents")
        .select("doc_id", "text").collect()
        .map(r => r.getLong(0) ->
          Analyzer.tokenize(r.getString(1)).toSet.intersect(judge.toSet).size.toLong)
        .toMap
      val ranked = SearchEngine.topKWand(spark, idx.paths.root, q, k)
        .select("doc_id").collect().map(_.getLong(0))
      def gain(r: Long, i: Int) =
        (math.pow(2.0, r.toDouble) - 1.0) / (math.log(i + 1.0) / math.log(2.0))
      val rels = ranked.zipWithIndex.map { case (d, i) => (rel(d), i + 1) }
      val p = rels.count(_._1 >= 2).toDouble / k
      val mrr = rels.find(_._1 >= 2).map(x => 1.0 / x._2).getOrElse(0.0)
      val dcg = rels.map { case (r, i) => gain(r, i) }.sum
      val idcg = rel.values.toSeq.sorted.reverse.take(k)
        .zipWithIndex.map { case (r, i) => gain(r, i + 1) }.sum
      (p, mrr, dcg / idcg)
    }

    val full = Seq("join", "window", "vector")
    // same-terms form AND the split form (cheap query, full judgments)
    for (q <- Seq(full, Seq("join"))) {
      val row = RankEval.evaluate(spark, idx.paths.root, sfDir, q, k,
        judgmentTerms = full).collect().head
      val (p, mrr, ndcg) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
      val (wp, wm, wn) = recompute(q, full)
      assert(math.abs(p - wp) < 1e-6, s"q=$q")
      assert(math.abs(mrr - wm) < 1e-6, s"q=$q")
      assert(math.abs(ndcg - wn) < 1e-6, s"q=$q")
      assert(ndcg > 0.0 && ndcg <= 1.0)
    }
  }

  test("adjacency_matrix counts equal local filters; bucket_sort respects HAVING and page") {
    val events = Catalog.readTable(spark, sfDir, "events")
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val got = graft.operators.EsAggs.adjacencyMatrix(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("click") == events.count(_._1 == "click"))
    assert(got("error") == events.count(_._1 == "error"))
    assert(got("high") == events.count(_._2 > 300.0))
    assert(got("click&error") == 0L) // disjoint filters: empty intersection
    assert(got("click&high") == events.count(e => e._1 == "click" && e._2 > 300.0))
    assert(got("error&high") == events.count(e => e._1 == "error" && e._2 > 300.0))

    val bs = graft.operators.EsAggs.bucketSelectorSort(spark, sfDir, 20L, 5)
      .collect().map(r => r.getLong(1))
    assert(bs.length <= 5)
    assert(bs.forall(_ >= 20L))
    assert(bs.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
  }
}
