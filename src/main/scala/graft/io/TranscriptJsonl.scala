package graft.io

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Turn

/** Ingest adapter for real agent-transcript JSONL (the tx_survey.jsonl
  * payload shape): one line per event; user/assistant message events carry a
  * content-block array (text / thinking / tool_use / tool_result blocks).
  *
  * Mapping to the north-rule Turn shape:
  *   conv_id  = session_id
  *   turn_idx = position of the message within its session (timestamp order)
  *   role     = message.role
  *   text     = concatenated text + thinking blocks
  *   tool     = first tool_use block's name, else ""
  *   ts       = event timestamp
  *
  * Schema is explicit (never inferred) so drift fails at analysis time; a
  * string-typed user `content` (legacy shape) reads as null text rather than
  * breaking the pipeline.
  */
object TranscriptJsonl {

  val schema: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("session_id", StringType),
    StructField("timestamp", StringType),
    StructField("message", StructType(Seq(
      StructField("role", StringType),
      StructField("content", ArrayType(StructType(Seq(
        StructField("type", StringType),
        StructField("text", StringType),
        StructField("thinking", StringType),
        StructField("name", StringType))))))))))

  def readTurns(spark: SparkSession, path: String): Dataset[Turn] = {
    import spark.implicits._
    val raw = spark.read.schema(schema).json(path)
      .filter($"type".isin("user", "assistant") && $"message".isNotNull)
    val w = Window.partitionBy($"session_id").orderBy($"timestamp")
    raw
      .withColumn("turn_idx", (row_number().over(w) - 1).cast("int"))
      .select(
        $"session_id".as("conv_id"),
        $"turn_idx",
        coalesce($"message.role", lit("")).as("role"),
        coalesce(
          concat_ws(" ",
            expr("transform(filter(message.content, c -> c.text IS NOT NULL OR c.thinking IS NOT NULL), c -> coalesce(c.text, c.thinking))")),
          lit("")).as("text"),
        coalesce(
          // get() (not [0]) — tolerates empty arrays under ANSI mode
          expr("get(filter(message.content, c -> c.type = 'tool_use'), 0).name"),
          lit("")).as("tool"),
        to_timestamp($"timestamp").as("ts"))
      .as[Turn]
  }
}
