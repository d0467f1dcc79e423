package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Catalog
import graft.io.Catalog.IndexPaths

/** ES `phrase` suggester ("did you mean", two-term form): per-position
  * candidate generation from the DICTIONARY (edit distance ≤ 1, the term
  * suggester's expansion — dist 0 keeps the original), then candidate
  * PHRASES re-ranked by a corpus bigram language model — the part the term
  * suggester can't do ("jion hash" → "join hash" beats "lion hash" because
  * the bigram evidence votes, not just the unigram df).
  *
  * LM: add-one smoothed, trained on the index's own artifacts —
  * p(w1) = (cf₁+1)/(total+|V|), p(w2|w1) = (bigram(w1,w2)+1)/(cf₁+|V|);
  * score = ln p(w1) + ln p(w2|w1). cf/total/|V| come straight from the
  * dictionary + corpus stats (already materialized at build time); bigram
  * counts are one adjacent-pair aggregation over the corpus, filtered to
  * the ≤ maxExp² candidate pairs before the count — at 100 TB the full
  * bigram table is an index artifact (built once, like the positional
  * index), and the per-query cost is a dictionary expansion plus a
  * ≤ maxExp² lookup, exactly ES's shard-local shape.
  */
object Suggest {

  def phrase(spark: SparkSession, root: String, sfDir: String,
      input: Seq[String], n: Int = 5, maxDist: Int = 1,
      maxExp: Int = 10): DataFrame = {
    import spark.implicits._
    require(input.length == 2, "two-term phrase form")
    val paths = IndexPaths(root)
    val dict = Catalog.readDictionary(spark, paths).toDF()

    def candidates(term: String): Array[(String, Long)] =
      dict
        .filter(abs(length($"term") - lit(term.length)) <= maxDist)
        .withColumn("dist", levenshtein($"term", lit(term)))
        .filter($"dist" <= maxDist)
        .orderBy($"dist".asc, $"df".desc, $"term".asc)
        .limit(maxExp)
        .select($"term", $"cf")
        .collect().map(r => (r.getString(0), r.getLong(1)))

    val c1 = candidates(input(0))
    val c2 = candidates(input(1))
    val stats = Catalog.readCorpusStats(spark, paths)
    val total = stats.total_tokens
    val v = dict.count()

    // adjacent-pair counts, filtered to the candidate pairs BEFORE the agg
    // (predicate on both columns; ≤ maxExp² groups survive)
    val s1 = c1.map(_._1).toSeq
    val s2 = c2.map(_._1).toSeq
    val bigrams = Catalog.readTable(spark, sfDir, "documents")
      .select(graft.core.Analyzer.tokensCol($"text").as("t"))
      .select(explode(expr(
        "transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS w1, t[i] AS w2))")).as("p"))
      .select($"p.w1", $"p.w2")
      .filter($"w1".isin(s1: _*) && $"w2".isin(s2: _*))
      .groupBy($"w1", $"w2").agg(count(lit(1)).as("big"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap

    val scored = for ((w1, cf1) <- c1.toSeq; (w2, _) <- c2.toSeq) yield {
      val big = bigrams.getOrElse((w1, w2), 0L)
      val s = math.log((cf1 + 1.0) / (total + v)) +
        math.log((big + 1.0) / (cf1 + v))
      (w1, w2, s)
    }
    scored.toDF("cand1", "cand2", "s")
      .orderBy($"s".desc, $"cand1".asc, $"cand2".asc)
      .limit(n)
      .select($"cand1", $"cand2", round($"s", 4).as("score_r4"))
  }
}
