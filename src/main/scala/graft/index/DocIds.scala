package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions.{col, count, lit}

import graft.model.{DocIdEntry, NumberedTurn, Turn}

/** Dense stable docID assignment (SURVEY.md §2 row 4).
  *
  * doc_id = 0-based rank of (conv_id, turn_idx) under lexicographic order —
  * the "stable turn ordering" invariant of the north star. RDD-free,
  * persist-free, and deterministic across executions:
  *
  *   1. collect explicit range boundaries from a fixed-seed key sample
  *      (a driver-side array of ≤ 32·P keys — O(P), not O(N));
  *   2. `__part` = binary search of each row's key against the broadcast
  *      boundaries — a PURE FUNCTION of row content, so every pass computes
  *      the identical assignment with no cross-job coordination;
  *   3. per-part counts → driver prefix sums (a P-row aggregate);
  *   4. hash-repartition by `__part` (never splits a part), sort within
  *      partitions by (part, keys), zip from the part's offset.
  *
  * Why not `repartitionByRange` + persist (the previous design): Spark's
  * RangePartitioner seeds its reservoir sample with the RDD id, so two
  * executions of the same plan can draw different boundaries — the count
  * pass and the zip pass only agreed while the sorted corpus stayed
  * persisted, and that cache was never safely releasable (the returned
  * Dataset is lazy; callers act on it after assign returns). Content-based
  * partition assignment removes the coordination problem instead of caching
  * around it: no persisted blocks, and re-executions (including Verify's
  * write actions and resumed builds) are bit-stable by construction.
  *
  * Scale: three passes over the input — a count (Parquet answers it from
  * footer metadata), a key-columns-only scan (column-pruned) for the part
  * histogram, and the full-row zip pass. At 10^12 turns each pass is
  * embarrassingly parallel and the only exchange is the one hash shuffle
  * on `__part` (uniform by construction — boundaries equalize counts).
  */
object DocIds {

  /** Compare two key tuples (nulls first, matching Spark asc_nulls_first). */
  private def compareKeys(a: Array[Any], b: Array[Any]): Int = {
    var i = 0
    while (i < a.length) {
      val c = (a(i), b(i)) match {
        case (null, null) => 0
        case (null, _) => -1
        case (_, null) => 1
        case (x: String, y: String) => x.compareTo(y)
        case (x: java.lang.Integer, y: java.lang.Integer) => x.compareTo(y)
        case (x: java.lang.Long, y: java.lang.Long) => x.compareTo(y)
        case (x: java.lang.Double, y: java.lang.Double) => x.compareTo(y)
        case (x: java.lang.Float, y: java.lang.Float) => x.compareTo(y)
        case (x: java.lang.Short, y: java.lang.Short) => x.compareTo(y)
        case (x: java.lang.Byte, y: java.lang.Byte) => x.compareTo(y)
        case (x: java.lang.Boolean, y: java.lang.Boolean) => x.compareTo(y)
        case (x: java.sql.Timestamp, y: java.sql.Timestamp) => x.compareTo(y)
        case (x: java.sql.Date, y: java.sql.Date) => x.compareTo(y)
        case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.compareTo(y)
        case (x, y) =>
          throw new IllegalArgumentException(
            s"unsupported sort-key type: ${x.getClass} vs ${y.getClass}")
      }
      if (c != 0) return c
      i += 1
    }
    0
  }

  /** Part of a key = number of boundaries ≤ key (upper-bound binary search). */
  private def partOf(key: Array[Any], bounds: Array[Array[Any]]): Int = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (compareKeys(key, bounds(mid)) < 0) hi = mid else lo = mid + 1
    }
    lo
  }

  /** Explicit deterministic range boundaries from a fixed-seed sample:
    * ≤ numPartitions−1 keys splitting the key space into balanced parts.
    */
  private def sampleBoundaries(df: DataFrame, sortCols: Seq[String],
      numPartitions: Int, totalRows: Long): Array[Array[Any]] = {
    if (totalRows == 0 || numPartitions <= 1) return Array.empty
    val target = numPartitions * 32L
    val fraction = math.min(1.0, target.toDouble / totalRows)
    val sampled = df.select(sortCols.map(col): _*)
      .sample(withReplacement = false, fraction, seed = 42L)
      .collect()
      .map(r => Array.tabulate[Any](r.length)(r.get))
      .sortWith(compareKeys(_, _) < 0)
    if (sampled.isEmpty) return Array.empty
    val step = math.max(1, sampled.length / numPartitions)
    (step until sampled.length by step)
      .take(numPartitions - 1)
      .map(sampled(_))
      .toArray
  }

  /** Generic dense-rank assignment: prepend `rid` = 0-based rank of the row
    * under lexicographic `sortCols` order. Output rows are grouped by part
    * and key-sorted within partitions (not globally ordered — add an
    * `orderBy` downstream if presentation order matters).
    */
  def denseIds(df: DataFrame, sortCols: Seq[String], numPartitions: Int): DataFrame = {
    import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
    val spark = df.sparkSession

    val totalRows = df.count()
    val bounds = sampleBoundaries(df, sortCols, numPartitions, totalRows)
    val bcBounds = spark.sparkContext.broadcast(bounds)

    // __part: pure function of row content (identical in every pass);
    // key indices resolved against each input's own schema, since the
    // histogram pass runs over a sortCols-only projection
    def withPart(in: DataFrame): DataFrame = {
      val schema = StructType(in.schema.fields :+ StructField("__part", IntegerType, nullable = false))
      val keyIdx = sortCols.map(in.schema.fieldIndex).toArray
      in.mapPartitions { it =>
        val bs = bcBounds.value
        it.map { r =>
          val key = Array.tabulate[Any](keyIdx.length)(i => r.get(keyIdx(i)))
          Row.fromSeq(r.toSeq :+ partOf(key, bs))
        }
      }(org.apache.spark.sql.Encoders.row(schema))
    }

    // per-part histogram from the key-pruned scan → prefix-sum offsets
    val numParts = bounds.length + 1
    val counts = withPart(df.select(sortCols.map(col): _*))
      .groupBy(col("__part")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = new Array[Long](numParts)
    var acc = 0L
    var i = 0
    while (i < numParts) {
      offsets(i) = acc
      acc += counts.getOrElse(i, 0L)
      i += 1
    }
    val bcOffsets = spark.sparkContext.broadcast(offsets)

    val outSchema = StructType(StructField("rid", LongType, nullable = false) +: df.schema.fields)
    implicit val rowEnc = org.apache.spark.sql.Encoders.row(outSchema)
    withPart(df)
      .repartition(numParts, col("__part"))
      .sortWithinPartitions(col("__part") +: sortCols.map(col): _*)
      .mapPartitions { it =>
        val off = bcOffsets.value
        var curPart = -1
        var id = 0L
        it.map { r =>
          val p = r.getInt(r.length - 1)
          if (p != curPart) { curPart = p; id = off(p) }
          val out = Row.fromSeq(id +: r.toSeq.dropRight(1))
          id += 1
          out
        }
      }
  }

  def assign(turns: Dataset[Turn], numPartitions: Int): Dataset[NumberedTurn] = {
    val spark = turns.sparkSession
    import spark.implicits._
    denseIds(turns.toDF(), Seq("conv_id", "turn_idx"), numPartitions)
      .withColumnRenamed("rid", "doc_id")
      .as[NumberedTurn]
  }

  def toDocidMap(numbered: Dataset[NumberedTurn]): Dataset[DocIdEntry] = {
    import numbered.sparkSession.implicits._
    numbered.map(n => DocIdEntry(n.doc_id, n.conv_id, n.turn_idx))
  }
}
