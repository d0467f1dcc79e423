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

  /** One session interval held in [[sessionizeWithState]] state: epoch-
    * millis bounds + event count.
    */
  case class OpenSession(startMs: Long, lastMs: Long, n: Long)

  /** [[sessionizeWithState]] state: the user's not-yet-watermark-safe
    * sessions, ascending by start. Bounded: a session is retained only
    * while `lastMs + gap ≥ watermark`, so the list never holds more than
    * ⌈watermarkDelay / gap⌉ + 1 entries (3 here) regardless of input.
    */
  case class SessState(sessions: List[OpenSession])

  /** A closed session emitted by [[sessionizeWithState]]. */
  case class ClosedSession(user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Long)

  /** CUSTOM-state sessionization via `flatMapGroupsWithState` — the API for
    * session semantics `session_window` can't express (per-session event
    * counts with arbitrary state transitions; here it reproduces the
    * 30-minute-gap semantics so the batch twin can check it).
    *
    * Protocol (watermark-safe; ADVICE r5 — the previous version emitted a
    * session the moment an intra-batch gap exceeded `gapSec`, but with
    * watermark delay (1 h) > gap (30 min) a later batch can legally carry
    * an out-of-order event that lands INSIDE an already-emitted gap,
    * splitting/undercounting the session):
    *  - each invocation merges the user's new events into the session list
    *    from state (interval merge on the gap: an event extends any session
    *    within `gap` of it, and can bridge two formerly-separate sessions —
    *    start/end/count all update correctly for pre-start late events);
    *  - a session is emitted ONLY once `lastMs + gap < watermark` — no
    *    event that could still legally arrive (ts ≥ watermark) can touch it;
    *  - the rest stay buffered with an EVENT-TIME timeout at the earliest
    *    `lastMs + gap`; the timeout re-partitions and emits as the
    *    watermark advances, with no further input needed.
    *
    * State per key is O(watermarkDelay / gap) sessions (≤ 3 here) — at 10^9
    * users still the bounded-state design Structured Streaming's state
    * store shards and checkpoints for free.
    */
  def sessionizeWithState(spark: SparkSession, inputDir: String,
      schema: org.apache.spark.sql.types.StructType,
      gapSec: Long = 1800): Dataset[ClosedSession] = {
    import spark.implicits._
    val gapMs = gapSec * 1000L

    // interval merge: sessions and single-event intervals, ascending by
    // start; consecutive intervals within gapMs merge (bounds widen, counts
    // add). Both inputs sorted ⇒ one linear fold.
    def merge(sessions: List[OpenSession], events: Array[Long]): List[OpenSession] = {
      val items = (sessions ++ events.map(t => OpenSession(t, t, 1)))
        .sortBy(s => (s.startMs, s.lastMs))
      items.foldLeft(List.empty[OpenSession]) {
        case (Nil, s) => s :: Nil
        case (cur :: done, s) if s.startMs - cur.lastMs <= gapMs =>
          OpenSession(cur.startMs, math.max(cur.lastMs, s.lastMs), cur.n + s.n) :: done
        case (acc, s) => s :: acc
      }.reverse
    }

    // emit sessions no in-watermark event can still extend; buffer the rest
    def flush(user: Long, all: List[OpenSession], state: GroupState[SessState])
        : Iterator[ClosedSession] = {
      val wm = state.getCurrentWatermarkMs()
      val (safe, pending) = all.partition(_.lastMs + gapMs < wm)
      if (pending.isEmpty) { if (state.exists) state.remove() }
      else {
        state.update(SessState(pending))
        // clamp above the watermark: Spark rejects timeouts at/behind it
        state.setTimeoutTimestamp(
          math.max(pending.map(_.lastMs).min + gapMs, wm + 1L))
      }
      safe.iterator.map(s => ClosedSession(user, s.startMs, s.lastMs, s.n))
    }

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
            state: GroupState[SessState]) => {
          val held = state.getOption.map(_.sessions).getOrElse(Nil)
          if (state.hasTimedOut) flush(user, held, state)
          else {
            val sorted = events.map(_._2.getTime).toArray.sorted
            flush(user, merge(held, sorted), state)
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
