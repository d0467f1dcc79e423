package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** ES `cardinality` (HLL++) error contract: the estimate is approximate BY
  * CONTRACT — what must hold is the relative error bound vs exact, pinned
  * here at two corpus scales on the seeded fixture tables. The driver entry
  * (`cardinality_users`) is rows-only for the same reason: sketch estimates
  * are not bit-reproducible across engines, so no hash oracle can exist.
  */
class CardinalitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  private def relErrs(sfDir: String): Seq[(String, Long, Long, Double)] = {
    import spark.implicits._
    graft.io.Catalog.readTable(spark, sfDir, "events")
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("exact"),
        approx_count_distinct($"user_id", rsd = 0.05).as("approx"))
      .select($"event_type", $"exact", $"approx")
      .as[(String, Long, Long)]
      .collect().toSeq
      .map { case (t, e, a) =>
        (t, e, a, if (e == 0) 0.0 else math.abs(a - e).toDouble / e)
      }
  }

  test("HLL estimate within the configured rsd envelope at two scales") {
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val errs = relErrs(sf)
      assert(errs.nonEmpty)
      // rsd is a standard deviation, not a hard bound — allow 4 sigma,
      // the envelope Spark's own HLL++ tests use
      errs.foreach { case (t, e, a, r) =>
        assert(r <= 4 * 0.05,
          s"$sf/$t: approx $a vs exact $e (rel err $r) breaches 4*rsd")
      }
    }
  }

  test("estimate is deterministic across repeated runs (same sketch, same result)") {
    val a = relErrs("/root/testdata/sf0.001")
    val b = relErrs("/root/testdata/sf0.001")
    assert(a == b, "HLL++ in Spark is deterministic for identical input")
  }
}
