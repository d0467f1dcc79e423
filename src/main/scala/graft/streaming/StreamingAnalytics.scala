package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analytics over an events-shaped stream (SURVEY.md §2 rows
  * 20/23/24 streaming forms): watermarked tumbling-window aggregation and
  * session windows. Late rows beyond the watermark are dropped by the engine
  * and visible in each query's `lastProgress.stateOperators` metrics.
  */
object StreamingAnalytics {

  /** Daily tumbling-window counts per event type, 1-hour watermark. */
  def windowedEventCounts(spark: SparkSession, inputDir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    import spark.implicits._
    spark.readStream
      .schema(schema)
      .parquet(inputDir)
      .withColumn("ts", $"ts".cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 day"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("sum_value"))
      .select($"window.start".as("day"), $"event_type", $"n", $"sum_value")
  }

  /** Open-session state for [[sessionizeWithState]]: epoch-millis bounds +
    * event count of the user's current (not yet closed) session.
    */
  case class OpenSession(startMs: Long, lastMs: Long, n: Long)

  /** A closed session emitted by [[sessionizeWithState]]. */
  case class ClosedSession(user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Long)

  /** CUSTOM-state sessionization via `flatMapGroupsWithState` — the API for
    * session semantics `session_window` can't express (per-session event
    * counts with arbitrary state transitions; here it reproduces the
    * 30-minute-gap semantics so the batch twin can check it).
    *
    * Protocol (the canonical Spark sessionization shape):
    *  - each invocation folds the user's new events (sorted — intra-batch
    *    order is not guaranteed) into the open session from state;
    *  - a gap > `gapSec` closes the running session and emits it
    *    immediately (safe under the watermark: an event late enough to land
    *    inside an emitted gap would have been dropped upstream);
    *  - the trailing session stays in state with an EVENT-TIME timeout at
    *    lastTs + gap; when the watermark passes that, the timeout fires and
    *    the session is emitted with no further input.
    *
    * State per key is O(1) (three longs) — at 10^9 users this is the
    * bounded-state design Structured Streaming's state store shards and
    * checkpoints for free.
    */
  def sessionizeWithState(spark: SparkSession, inputDir: String,
      schema: org.apache.spark.sql.types.StructType,
      gapSec: Long = 1800): Dataset[ClosedSession] = {
    import spark.implicits._
    val gapMs = gapSec * 1000L
    spark.readStream
      .schema(schema)
      .parquet(inputDir)
      .withColumn("ts", $"ts".cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .select($"user_id".cast("long"), $"ts")
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, events: Iterator[(Long, java.sql.Timestamp)],
            state: GroupState[OpenSession]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(user, s.startMs, s.lastMs, s.n))
          } else {
            val sorted = events.map(_._2.getTime).toArray.sorted
            var open = state.getOption.orNull
            val out = scala.collection.mutable.ArrayBuffer[ClosedSession]()
            sorted.foreach { t =>
              open match {
                case null => open = OpenSession(t, t, 1)
                case s if t - s.lastMs > gapMs =>
                  out += ClosedSession(user, s.startMs, s.lastMs, s.n)
                  open = OpenSession(t, t, 1)
                case s => open = OpenSession(s.startMs, math.max(s.lastMs, t), s.n + 1)
              }
            }
            state.update(open)
            state.setTimeoutTimestamp(open.lastMs + gapMs)
            out.iterator
          }
        })
  }

  /** Per-user session windows (30-minute inactivity gap), watermarked. */
  def sessionCounts(spark: SparkSession, inputDir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    import spark.implicits._
    spark.readStream
      .schema(schema)
      .parquet(inputDir)
      .withColumn("ts", $"ts".cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .groupBy(session_window($"ts", "30 minutes").as("sess"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", $"sess.start".as("sess_start"), $"sess.end".as("sess_end"), $"n_events")
  }
}
