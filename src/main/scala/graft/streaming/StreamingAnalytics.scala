package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
