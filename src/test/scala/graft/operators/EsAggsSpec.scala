package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.{IndexCache, TestSpark}
import graft.io.Catalog

class EsAggsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  private val sfDir = "/root/testdata/sf0.001"

  test("composite: page walk covers the full bucket space exactly once, in key order") {
    import spark.implicits._
    val all = Catalog.readTable(spark, sfDir, "documents")
      .groupBy($"lang", $"source").count()
      .as[(String, String, Long)].collect()
      .map { case (l, s, n) => ((l, s), n) }.sortBy(_._1)
    var after: Option[(String, String)] = None
    var seen = Vector.empty[((String, String), Long)]
    var pages = 0
    var done = false
    while (!done) {
      val page = EsAggs.composite(spark, sfDir, 7, after)
        .as[(String, String, Long)].collect()
        .map { case (l, s, n) => ((l, s), n) }
      pages += 1
      // within-page and cross-page key order is strict
      assert(page.map(_._1).toSeq == page.map(_._1).toSeq.sorted)
      seen ++= page
      if (page.length < 7) done = true else after = Some(page.last._1)
      assert(pages <= all.length + 1, "page walk must terminate")
    }
    assert(seen.toSeq == all.toSeq, "pages must tile the bucket space exactly")
    assert(pages > 1, "fixture must exercise multiple pages")
  }

  test("filters agg matches direct predicate counts; a row may land in several buckets") {
    import spark.implicits._
    val events = Catalog.readTable(spark, sfDir, "events").cache()
    val r = EsAggs.filtersAgg(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("clicks") == events.filter($"event_type" === "click").count())
    assert(r.getAs[Long]("high_value") == events.filter($"value" > 300.0).count())
    assert(r.getAs[Long]("total") == events.count())
    // buckets overlap (purchase & >300 counts in both high_value and
    // big_purchases), so bucket sums exceed a partition of total
    assert(r.getAs[Long]("clicks") + r.getAs[Long]("errors") <= r.getAs[Long]("total"))
    events.unpersist()
  }

  test("range agg: buckets tile [min,max) — counts sum to total, bounds respected") {
    import spark.implicits._
    val got = EsAggs.rangeAgg(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val total = Catalog.readTable(spark, sfDir, "events").count()
    assert(got.values.sum == total)
    val lo = Catalog.readTable(spark, sfDir, "events")
      .filter($"value" < 50.0).count()
    assert(got.getOrElse("*-50", 0L) == lo)
  }

  test("extended_stats: population moments are internally consistent") {
    val rows = EsAggs.extendedStats(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (v, s) = (r.getAs[Double]("var_v"), r.getAs[Double]("std_v"))
      assert(math.abs(s * s - v) < 1e-2, s"std^2 != var for ${r.getString(0)}")
      assert(r.getAs[Double]("min_v") <= r.getAs[Double]("avg_v") &&
        r.getAs[Double]("avg_v") <= r.getAs[Double]("max_v"))
    }
  }

  test("terms ordered by sub-agg metric: descending avg, stable key tiebreak") {
    val rows = EsAggs.termsOrderBySubagg(spark, sfDir, 5).collect()
      .map(r => (r.getString(0), r.getAs[Double]("avg_chars")))
    assert(rows.length == 5)
    assert(rows.map(-_._2).toSeq == rows.map(-_._2).toSeq.sorted)
  }

  test("rare_terms: pure dictionary work, df bound honored, matches raw df") {
    import spark.implicits._
    val root = IndexCache.documentsIndex(spark, sfDir).paths.root
    val got = EsAggs.rareTerms(spark, root, 60L)
      .as[(String, Long)].collect().toSeq
    assert(got.nonEmpty && got.forall(_._2 <= 60L))
    val raw = Catalog.readDocuments(spark, sfDir)
      .flatMap(d => graft.core.Analyzer.tokenize(d.text).distinct)
      .groupByKey(identity).count().filter(_._2 <= 60L)
      .collect().sortBy(t => (t._2, t._1)).toSeq
    assert(got == raw)
  }

  test("top_metrics is argmax not max; percentile_ranks bounded; histogram buckets align") {
    import spark.implicits._
    val events = graft.io.Catalog.readTable(spark, sfDir, "events")
      .select("event_type", "event_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val tm = EsAggs.topMetrics(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    tm.foreach { case (et, v, id) =>
      val latest = events.filter(_._1 == et).maxBy(_._2)
      assert(id == latest._2 && v == latest._3, et)
    }
    val pr = EsAggs.percentileRanks(spark, sfDir, Seq(100.0, 250.0)).collect()
    pr.foreach { r =>
      val (p100, p250) = (r.getDouble(1), r.getDouble(2))
      assert(p100 >= 0.0 && p100 <= p250 && p250 <= 100.0)
    }
    val h = EsAggs.histogramNumeric(spark, sfDir, 50L).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(h.map(_._2).sum == events.length)
    h.foreach { case (b, _) => assert(b % 50 == 0) }
  }

  test("pipeline aggs: cumulative sum ends at total; derivative and moving_avg windows") {
    import spark.implicits._
    val rows = EsAggs.histogramPipeline(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val counts = rows.map(_.getAs[Long]("n_events"))
    assert(rows.last.getAs[Long]("cum_events") == counts.sum)
    assert(rows.head.isNullAt(rows.head.fieldIndex("deriv")))
    rows.zipWithIndex.drop(1).foreach { case (r, i) =>
      assert(r.getAs[Long]("deriv") == counts(i) - counts(i - 1))
      val w = counts.slice(math.max(0, i - 6), i + 1)
      val want = math.rint(w.sum.toDouble / w.length * 1e4) / 1e4
      assert(math.abs(r.getAs[Double]("mavg7_r4") - want) < 1e-9)
    }
  }

  test("auto_date_histogram picks the coarsest unit fitting the target") {
    // the sf0.001 events span ~30 days: 40-bucket target → day; a huge
    // target → hour; a 5-bucket target → month
    val day = EsAggs.autoDateHistogram(spark, sfDir, 40).collect()
    assert(day.forall(_.getAs[String]("unit") == "day") && day.length <= 40)
    val hour = EsAggs.autoDateHistogram(spark, sfDir, 100000).collect()
    assert(hour.forall(_.getAs[String]("unit") == "hour") && hour.length > day.length)
    val month = EsAggs.autoDateHistogram(spark, sfDir, 5).collect()
    assert(month.forall(_.getAs[String]("unit") == "month") && month.length <= 5)
    assert(day.map(_.getAs[Long]("n_events")).sum ==
      month.map(_.getAs[Long]("n_events")).sum)
  }

  test("date_range buckets partition all events; open ends unbounded") {
    val rows = EsAggs.dateRange(spark, sfDir,
      Seq("2024-01-10 00:00:00", "2024-01-20 00:00:00")).collect()
    assert(rows.length == 3)
    val total = EsAggs.autoDateHistogram(spark, sfDir, 5)
      .collect().map(_.getAs[Long]("n_events")).sum
    assert(rows.map(_.getAs[Long]("n_events")).sum == total)
  }

  test("boxplot quartiles are ordered; MAD bounded by the range") {
    val r = EsAggs.boxplotMad(spark, sfDir).collect().head
    val Seq(mn, q1, q2, q3, mx, mad) = Seq("min_v", "q1", "q2", "q3", "max_v", "mad")
      .map(r.getAs[Double])
    assert(mn <= q1 && q1 <= q2 && q2 <= q3 && q3 <= mx)
    assert(mad >= 0 && mad <= (mx - mn))
  }

  test("diversified_sampler caps per-key contribution") {
    val rows = EsAggs.diversifiedSampler(spark, sfDir, 20).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("n_sampled") <= 20))
  }
}
