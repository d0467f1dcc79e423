package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Analyzer
import graft.io.Catalog

/** Corpus-hygiene operators a 100 TB training-data pipeline runs between
  * dedup and packing: repetition statistics (the Gopher-style "repetitive
  * document" signals), benchmark decontamination (n-gram overlap against a
  * held-out eval set), and deterministic hash-based splits / stratified
  * samples (reproducible without any stored state — the split IS the
  * function).
  *
  * All deterministic with DuckDB oracle twins; the per-doc passes are
  * narrow (no shuffle), the decontamination join broadcasts the eval side.
  */
object Hygiene {

  /** Repetition signals per document (Rae et al. 2021 "Gopher" §A1.1
    * repetition filters, token-level form): fraction of tokens that are
    * repeats of an earlier token, and the share of bigram slots taken by
    * the single most frequent bigram. High values flag boilerplate /
    * degenerate documents for the curation funnel.
    *
    * One typed map per row — a per-doc HashMap tally is O(dl) where the
    * HOF/self-join formulations are O(dl²) or a corpus-wide shuffle; the
    * pass stays narrow and codegen feeds it straight from the parquet scan.
    */
  def repetitionStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Catalog.readTable(spark, sfDir, "documents")
      .select($"doc_id", $"text")
      .as[(Long, String)]
      .map { case (docId, text) =>
        val t = Analyzer.tokenize(text).toArray
        val n = t.length
        val distinct = new java.util.HashSet[String]()
        var i = 0
        while (i < n) { distinct.add(t(i)); i += 1 }
        val dupFrac = if (n == 0) 0.0 else (n - distinct.size).toDouble / n
        var topBigram = 0
        if (n >= 2) {
          val counts = new java.util.HashMap[String, Int]()
          i = 0
          while (i < n - 1) {
            val bg = t(i) + " " + t(i + 1)
            val c = counts.merge(bg, 1, Integer.sum)
            if (c > topBigram) topBigram = c
            i += 1
          }
        }
        val bgFrac = if (n < 2) 0.0 else topBigram.toDouble / (n - 1)
        (docId, n.toLong, dupFrac, bgFrac)
      }
      .toDF("doc_id", "n_tokens", "dup_token_frac", "top_bigram_frac")
      // HALF_UP via the Column round — the rounding DuckDB's round() also
      // uses (math.rint would tie-break half-even and diverge from the oracle)
      .select($"doc_id", $"n_tokens",
        round($"dup_token_frac", 6).as("dup_token_frac_r6"),
        round($"top_bigram_frac", 6).as("top_bigram_frac_r6"))
      .orderBy($"doc_id")
  }

  /** Benchmark decontamination: training docs sharing any token `n`-gram
    * with the eval set (here the deterministic holdout `doc_id % 97 = 0` —
    * in production, the benchmark suites). Returns each contaminated train
    * doc with its count of distinct shared shingles.
    *
    * The eval side is the small side by construction (benchmarks are MBs,
    * the corpus is TBs), so its distinct shingles broadcast and the check
    * is one narrow semi-join-shaped pass over the corpus — no corpus
    * shuffle. The corpus side explodes shingles but aggregates per doc
    * map-side before the (tiny, post-join) exchange.
    */
  def decontaminate(spark: SparkSession, sfDir: String, n: Int = 3): DataFrame = {
    import spark.implicits._
    val docs = Catalog.readTable(spark, sfDir, "documents")
    // per-doc dedup is array_distinct BEFORE the explode — row-local, so the
    // corpus side never shuffles (the old `.distinct()` on the exploded
    // (doc_id, s) pairs exchanged every training shingle just to dedupe
    // within each doc — guide §2.4: a distinct on data that is already
    // unique per key it is later grouped by). Same rows out: the per-doc
    // shingle SET is what both the join and the count consume.
    def shingles(df: DataFrame): DataFrame =
      df.select($"doc_id", Analyzer.tokensCol($"text").as("t"))
        .filter(size($"t") >= n) // sequence(0, <0) would run descending
        .select($"doc_id", explode(array_distinct(expr(
          s"transform(sequence(0, size(t) - $n), i -> " +
            (0 until n).map(j => s"element_at(t, i + ${j + 1})").mkString("concat_ws(' ', ", ", ", ")") +
            ")"))).as("s"))
    val evalShingles = shingles(docs.filter($"doc_id" % 97 === 0))
      .select($"s").distinct()
    shingles(docs.filter($"doc_id" % 97 =!= 0))
      .join(broadcast(evalShingles), "s")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shared"))
      .orderBy($"doc_id")
  }

  /** Deterministic train/holdout split by content-free hash: a document's
    * assignment is `md5(doc_id)`'s first hex nibble — stable across runs,
    * machines, and partitionings, with no stored split table to version.
    * Nibbles 0-1 → holdout (12.5%). Pure projection: no shuffle at all.
    */
  def splitHash(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Catalog.readTable(spark, sfDir, "documents")
      .select($"doc_id",
        when(substring(md5($"doc_id".cast("string").cast("binary")), 1, 1)
          .isin("0", "1"), "holdout").otherwise("train").as("split"))
      .orderBy($"doc_id")
  }

  /** Deterministic stratified sample: the `perStratum` docs with the
    * smallest `md5(doc_id)` per `source` stratum — an unbiased fixed-size
    * sample reproducible from the hash alone. Uses the bounded per-bucket
    * aggregator shape (ObjectHashAggregate with map-side partials, ≤
    * `perStratum` rows per stratum per input partition crossing the
    * exchange) — NOT a `row_number` window, which would shuffle the whole
    * corpus by the low-cardinality stratum key and sort each stratum in one
    * task (the r3 top_hits straggler, VERDICT r3).
    */
  def stratifiedSample(spark: SparkSession, sfDir: String,
      perStratum: Int = 3): DataFrame = {
    import spark.implicits._
    Catalog.readTable(spark, sfDir, "documents")
      .select($"source",
        md5($"doc_id".cast("string").cast("binary")).as("h"), $"doc_id")
      .as[(String, String, Long)]
      .groupByKey(_._1)
      .agg(new BottomKAgg(perStratum).toColumn.name("picks"))
      .flatMap { case (source, picks) =>
        picks.iterator.zipWithIndex.map { case ((_, doc), i) =>
          (source, (i + 1).toLong, doc)
        }
      }
      .toDF("source", "rn", "doc_id")
      .orderBy($"source", $"rn")
  }

  /** Domain-mixture sampling: select a maximal subset of the corpus whose
    * `source` composition matches the target weights (the DoReMi/Pile-style
    * "data mixture" step before packing). With per-domain counts c_d and
    * target weights w_d, the largest achievable total is
    * scale = min_d(c_d / w_d); each domain keeps rate_d = w_d·scale / c_d
    * of its docs, chosen by a content-free multiplicative hash of doc_id —
    * deterministic, stateless, reproducible on any partitioning.
    *
    * Scale shape: the counts agg is one tiny shuffle (|domains| rows), the
    * rates table broadcasts, and selection is a narrow filtered projection —
    * no corpus shuffle at all. Rate selection is hash-threshold (binomially
    * exact in expectation); the exact-count variant would need a per-domain
    * rank — a window by a low-cardinality key, the documented skew hazard.
    */
  def domainMix(spark: SparkSession, sfDir: String,
      targets: Map[String, Double]): DataFrame = {
    import spark.implicits._
    val docs = Catalog.readTable(spark, sfDir, "documents")
    val cnt = docs.groupBy($"source").agg(count(lit(1)).as("c"))
    val tgt = targets.toSeq.sortBy(_._1).toDF("source", "w")
    val joined = cnt.join(tgt, "source")
    val scale = joined.agg(min($"c" / $"w").as("s"))
    val rates = joined.crossJoin(broadcast(scale))
      .select($"source", least(lit(1.0), $"w" * $"s" / $"c").as("r"))
    // overflow-safe multiplicative hash: reduce doc_id mod 10^6 BEFORE the
    // Knuth multiply — ((d mod m)·c) mod m ≡ (d·c) mod m, and the product is
    // bounded by 10^6·2654435761 ≈ 2.7e15 << 2^63, so neither engine can
    // overflow at ANY doc_id (ADVICE r5: the raw product wrapped negative in
    // Spark past doc_id ≈ 3.47e9 — always-selected rows — while DuckDB threw)
    docs.join(broadcast(rates), "source")
      .filter(((($"doc_id" % 1000000L) * 2654435761L) % 1000000L) / 1000000.0 < $"r")
      .select($"doc_id", $"source")
      .orderBy($"doc_id")
  }

  /** PII-shaped redaction pass: numeric literals replaced by a placeholder
    * token, with the per-row redaction count (the audit column a compliance
    * pipeline keeps). The `events.props` JSON payloads carry the corpus's
    * only free-form literals; the same `regexp_replace` chain extends to
    * emails/phones/SSNs by adding alternates. Purely narrow — codegen'd
    * regex over the scan, no shuffle, scales embarrassingly.
    */
  def redactEvents(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Catalog.readTable(spark, sfDir, "events")
      .select($"event_id",
        regexp_replace($"props", "[0-9]+", "<NUM>").as("redacted"),
        regexp_count($"props", lit("[0-9]+")).cast("long").as("n_redactions"))
      .orderBy($"event_id")
  }

  /** Bounded per-stratum bottom-k by (hash asc, doc_id asc): the sampling
    * twin of search.Aggregations.TopHitsAgg — O(k) state per group,
    * partial-aggregated map-side.
    */
  private final class BottomKAgg(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        (String, String, Long), List[(String, Long)], Seq[(String, Long)]] {

    private def better(a: (String, Long), b: (String, Long)): Boolean = {
      val c = a._1.compareTo(b._1)
      c < 0 || (c == 0 && a._2 < b._2)
    }

    override def zero: List[(String, Long)] = Nil

    override def reduce(buf: List[(String, Long)],
        in: (String, String, Long)): List[(String, Long)] =
      insert(buf, (in._2, in._3))

    private def insert(buf: List[(String, Long)],
        e: (String, Long)): List[(String, Long)] = {
      def ins(l: List[(String, Long)]): List[(String, Long)] = l match {
        case Nil => e :: Nil
        case h :: t => if (better(e, h)) e :: l else h :: ins(t)
      }
      if (buf.lengthCompare(k) >= 0 && !better(e, buf.last)) buf
      else ins(buf).take(k)
    }

    override def merge(a: List[(String, Long)],
        b: List[(String, Long)]): List[(String, Long)] =
      b.foldLeft(a)((acc, e) => insert(acc, e))

    override def finish(buf: List[(String, Long)]): Seq[(String, Long)] = buf

    override def bufferEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(String, Long)]]()
    override def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
  }
}
