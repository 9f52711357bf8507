package graft.model

import org.apache.spark.sql.types._

/** Canonical schemas (BASELINE.json `input_hint` + FIXTURES.md §2). */
object Schemas {

  /** The transcripts table: (conv_id, turn_idx, role, text, tool, ts). */
  val transcript: StructType = StructType(Seq(
    StructField("conv_id", StringType),
    StructField("turn_idx", IntegerType),
    StructField("role", StringType),
    StructField("text", StringType),
    StructField("tool", StringType),
    StructField("ts", TimestampType)))

  /** Transcript v1 — before the `tool` drift column existed. */
  val transcriptV1: StructType =
    StructType(transcript.fields.filterNot(_.name == "tool"))

  /** Change-event envelope (the Kafka-stand-in log). */
  def envelope(turnSchema: StructType = transcript): StructType = StructType(Seq(
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("ts", TimestampType),
    StructField("op", StringType),
    StructField("conv_id", StringType),
    StructField("turn_idx", IntegerType),
    StructField("after", turnSchema),
    StructField("schema_v", IntegerType)))
}
