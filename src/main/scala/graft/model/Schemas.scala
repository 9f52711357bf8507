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

/** Envelope adapters for alternate upstream key shapes. */
object Envelopes {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions._

  /** Adapt a log whose record key is a single PRIMITIVE value (a `key`
    * string column) to the engine envelope — the reference accepts
    * primitive Kafka record keys and maps them onto the one configured PK
    * column (`/root/reference/src/main/java/io/confluent/connect/jdbc/sink/metadata/FieldsMetadata.java:237-330`).
    *
    * The primitive key becomes `conv_id`; `turn_idx` is recovered from the
    * payload for writes and is null on tombstones — so a primitive-key
    * tombstone is a SERIES delete, exactly the reference's
    * coarser-delete-key behavior (README.md:126-137).
    */
  def fromPrimitiveKey(df: DataFrame, keyCol: String = "key"): DataFrame =
    df.select(
      col("partition"), col("offset"), col("ts"), col("op"),
      col(keyCol).cast("string").as("conv_id"),
      col("after.turn_idx").as("turn_idx"),
      col("after"),
      col("schema_v"))
}
