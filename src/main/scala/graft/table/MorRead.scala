package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.NetAction

/** Merge-on-read: folds a table's base rows with its outstanding delta
  * files (per-batch net actions + series wipes) into the current state.
  *
  * This is the read half of the reference's O(changes)-per-batch DML
  * (`/root/reference/src/main/java/io/confluent/connect/jdbc/sink/BufferedRecords.java:294-336`):
  * the write path appends one folded action row per touched key per
  * commit (sequence number `seq` = the committing snapshot version, base
  * rows rank as seq 0), and the reader resolves, per (conv_id, turn_idx):
  *
  *  - the EXISTENCE anchor: the highest-seq Put/Del — Del ⇒ row gone,
  *    Put ⇒ row present, none ⇒ key never existed;
  *  - the VALUE: the highest-seq row-carrying action (Put or
  *    UpdateIfExists). An UpdateIfExists is only the value winner when it
  *    out-sequences the anchor Put, and the write path only emits an
  *    UpdateIfExists action when the key was not created in its own batch
  *    — so a value-winning update was necessarily applied while the key
  *    existed (no Del can sit between the anchor Put and a higher-seq
  *    update, or it would itself be the anchor);
  *  - series wipes: a wipe row (turn_idx null) at seq W discards every
  *    row of the conversation with seq < W. Same-commit actions carry
  *    seq == W and survive by construction (the batch fold already
  *    dropped events at or before the wipe offset).
  *
  * One hash-partitioned aggregation over base ∪ deltas — the same shape
  * and scale behavior as the in-batch fold (SURVEY.md §2.A A5/A6).
  */
object MorRead {

  /** Physical schema of a delta file (the `row` struct uses the table
    * schema as of the writing commit; later reads widen it — missing
    * nested fields surface as nulls, ALTER-ADD semantics).
    */
  def deltaSchema(tableSchema: StructType): StructType = StructType(Seq(
    StructField("conv_id", StringType),
    StructField("turn_idx", IntegerType), // null = series-wipe row
    StructField("action", StringType),
    StructField("row", tableSchema),
    StructField("seq", LongType)))

  /** Current state of (a bucket subset of) the table: `base` rows merged
    * with the net actions in `deltaPaths`.
    */
  def merged(
      spark: SparkSession,
      tableSchema: StructType,
      base: DataFrame,
      deltaPaths: Seq[String]): DataFrame = {
    if (deltaPaths.isEmpty) return base
    val cols = tableSchema.fieldNames.toSeq
    val deltas = spark.read.schema(deltaSchema(tableSchema)).parquet(deltaPaths: _*)

    val all = base
      .select(
        col("conv_id"), col("turn_idx"),
        lit(NetAction.Put).as("action"),
        struct(cols.map(col): _*).as("row"),
        lit(0L).as("seq"))
      .unionByName(deltas.select("conv_id", "turn_idx", "action", "row", "seq"))

    // wipes are usually rare, but can be bulk (GDPR-style batch deletes)
    // — no broadcast hint; AQE broadcasts when the aggregate is small
    val wipes = deltas
      .filter(col("action") === NetAction.Wipe)
      .groupBy("conv_id")
      .agg(max("seq").as("wipe_seq"))

    val aSeq = when(col("action").isin(NetAction.Put, NetAction.Del), col("seq"))
    val vSeq = when(col("action").isin(NetAction.Put, NetAction.UpdateIfExists), col("seq"))

    all
      .filter(col("turn_idx").isNotNull)
      .join(wipes, Seq("conv_id"), "left")
      .filter(col("seq") >= coalesce(col("wipe_seq"), lit(0L)))
      .groupBy("conv_id", "turn_idx")
      .agg(
        max(aSeq).as("a_seq"),
        max_by(col("action"), aSeq).as("a_action"),
        max_by(col("row"), vSeq).as("v_row"))
      .filter(col("a_seq").isNotNull && col("a_action") === NetAction.Put)
      .select(cols.map(c => col(s"v_row.$c").as(c)): _*)
  }
}
