package graft.index

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.{Fixtures, TestSpark}

/** Stable docID assignment invariants (FIXTURES.md §T; north-rule per-row
  * invariant: per-turn text equality under stable turn ordering).
  */
class DocIdsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  test("fixture synthesis is deterministic (two generations identical)") {
    assert(Fixtures.sfUnit == Fixtures.turns(20, 25))
  }

  test("assignment equals row_number oracle on randomly shuffled input") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val shuffled = new scala.util.Random(99).shuffle(Fixtures.sfUnit).toDS()
      .repartition(7) // scatter arbitrarily
    val got = DocIds.assign(shuffled, 4)
      .select($"doc_id", $"conv_id", $"turn_idx").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sortBy(_._1)
    val exp = shuffled.toDF()
      .withColumn("doc_id", row_number().over(Window.orderBy($"conv_id", $"turn_idx")) - 1)
      .select($"doc_id".cast("long"), $"conv_id", $"turn_idx").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sortBy(_._1)
    assert(got.toSeq == exp.toSeq)
  }

  test("assignment leaves no persisted blocks behind (VERDICT r1 item 6)") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.keySet
    DocIds.assign(Fixtures.sfUnit.toDS(), 4).collect()
    DocIds.denseIds(Fixtures.sfUnit.toDS().toDF(), Seq("conv_id", "turn_idx"), 4).collect()
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert(after == before, s"leaked RDD ids: ${after -- before}")
  }

  test("assignment is deterministic across repeated executions of the plan") {
    import spark.implicits._
    val ds = new scala.util.Random(3).shuffle(Fixtures.sfUnit).toDS().repartition(5)
    val numbered = DocIds.assign(ds, 4)
    val a = numbered.collect().sortBy(_.doc_id).toSeq
    val b = numbered.collect().sortBy(_.doc_id).toSeq // re-execute same lazy plan
    assert(a == b)
  }

  test("per-turn text equality under stable turn ordering") {
    import spark.implicits._
    val turns = Fixtures.sfUnit
    val byKey = turns.map(t => (t.conv_id, t.turn_idx) -> t.text).toMap
    val numbered = DocIds.assign(
      new scala.util.Random(7).shuffle(turns).toDS(), 4).collect()
    // every numbered turn carries exactly the text of its (conv, idx) key,
    // and docIDs are dense 0..N-1 in key order
    assert(numbered.forall(n => byKey((n.conv_id, n.turn_idx)) == n.text))
    val inOrder = numbered.sortBy(_.doc_id)
    assert(inOrder.map(_.doc_id).toSeq == (0L until turns.size.toLong))
    val keys = inOrder.map(n => (n.conv_id, n.turn_idx)).toSeq
    assert(keys == keys.sorted)
  }
}
