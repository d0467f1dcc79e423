package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions.{col, spark_partition_id}
import org.apache.spark.storage.StorageLevel

import graft.model.{DocIdEntry, NumberedTurn, Turn}

/** Dense stable docID assignment (SURVEY.md §2 row 4).
  *
  * doc_id = 0-based rank of (conv_id, turn_idx) under lexicographic order —
  * the "stable turn ordering" invariant of the north star. Implemented
  * shuffle-minimal and RDD-free as the classic two-pass zip:
  *
  *   1. range-repartition + sort-within-partitions on the sort keys
  *      — one Exchange(RangePartitioning); partitions are globally ordered;
  *   2. per-partition row counts → driver prefix sums (a collect of
  *      numPartitions longs — O(P), not O(N));
  *   3. per-partition zip with the partition's offset.
  *
  * Two correctness subtleties, both bitten-and-tested:
  *   - the sorted corpus stays persisted until the caller's action: range
  *     partitioning samples boundaries per shuffle execution, so a
  *     re-executed exchange could disagree with the boundaries pass 1
  *     counted against (at 10^12-turn scale stage S1 materializes the
  *     sorted corpus to a table, which fixes the partitioning the same way);
  *   - the partition index comes from the `spark_partition_id()` expression,
  *     NOT `TaskContext.getPartitionId()`: under a downstream `coalesce`,
  *     parent partitions are computed inside the coalesced task, where the
  *     TaskContext id is the coalesced one (observed: every partition zipped
  *     from offset 0). The expression binds to the true RDD partition index
  *     at plan level and survives coalescing.
  */
object DocIds {

  /** Compute per-partition offsets of a persisted, range-partitioned df. */
  private def partitionOffsets(sorted: DataFrame, numPartitions: Int): Array[Long] = {
    val counts = sorted
      .groupBy(spark_partition_id().as("__pid"))
      .count()
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    val offsets = new Array[Long](numPartitions)
    var acc = 0L
    var i = 0
    while (i < numPartitions) {
      offsets(i) = acc
      acc += counts.getOrElse(i, 0L)
      i += 1
    }
    offsets
  }

  def assign(turns: Dataset[Turn], numPartitions: Int): Dataset[NumberedTurn] = {
    val spark = turns.sparkSession
    import spark.implicits._

    val sorted = turns.toDF()
      .repartitionByRange(numPartitions, col("conv_id"), col("turn_idx"))
      .sortWithinPartitions(col("conv_id"), col("turn_idx"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val offsets = partitionOffsets(sorted, numPartitions)
    val bc = spark.sparkContext.broadcast(offsets)

    sorted
      .withColumn("__pid", spark_partition_id())
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val buf = it.buffered
          val pidIdx = buf.head.fieldIndex("__pid")
          var id = bc.value(buf.head.getInt(pidIdx))
          buf.map { r =>
            val n = NumberedTurn(id, r.getString(0), r.getInt(1), r.getString(2),
              r.getString(3), r.getString(4), r.getTimestamp(5))
            id += 1
            n
          }
        }
      }
  }

  def toDocidMap(numbered: Dataset[NumberedTurn]): Dataset[DocIdEntry] = {
    import numbered.sparkSession.implicits._
    numbered.map(n => DocIdEntry(n.doc_id, n.conv_id, n.turn_idx))
  }

  /** Generic dense-rank assignment for an arbitrary DataFrame ordered by
    * `sortCols` — used for the driver-oracled demo over `documents`
    * (oracle: `row_number() OVER (ORDER BY …) − 1`).
    */
  def denseIds(df: DataFrame, sortCols: Seq[String], numPartitions: Int): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}

    val cols = sortCols.map(col)
    val sorted = df
      .repartitionByRange(numPartitions, cols: _*)
      .sortWithinPartitions(cols: _*)
      .persist(StorageLevel.MEMORY_AND_DISK)

    val offsets = partitionOffsets(sorted, numPartitions)
    val bc = df.sparkSession.sparkContext.broadcast(offsets)

    val outSchema = StructType(StructField("rid", LongType, nullable = false) +: sorted.schema.fields)
    implicit val rowEnc = org.apache.spark.sql.Encoders.row(outSchema)
    sorted
      .withColumn("__pid", spark_partition_id())
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val buf = it.buffered
          val pidIdx = buf.head.fieldIndex("__pid")
          var id = bc.value(buf.head.getInt(pidIdx))
          buf.map { r =>
            val out = Row.fromSeq(id +: r.toSeq.dropRight(1))
            id += 1
            out
          }
        }
      }
  }
}
