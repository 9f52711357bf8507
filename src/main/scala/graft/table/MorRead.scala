package graft.table

import java.nio.file.{Files, Paths}

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
  * Read amplification is O(deltas + touched base rows), NOT O(touched
  * bucket): base rows whose key no delta touches take a shuffle-free
  * pass-through (broadcast anti-join against the delta key set), and only
  * the touched subset enters the fold aggregation. Deltas are O(changes)
  * and bounded per bucket by the compaction threshold, so the touched-key
  * set is broadcastable by construction; a defensive size gate
  * ([[PrunedReadMaxDeltaBytes]]) falls back to the full-bucket fold —
  * correct at any scale, just the pre-pruning shuffle shape. The
  * reference analogue: reads against an indexed table never rescan it
  * (`/root/reference/README.md:19-24`); Iceberg's equality-delete reads
  * use the same anti-join-against-delete-keys shape.
  */
object MorRead {

  /** Above this many total delta BYTES (across the buckets being read),
    * the touched-key set is no longer assumed broadcastable and the read
    * falls back to the full fold (one hash aggregation over base ∪
    * deltas). Compaction keeps per-bucket deltas far below this; the gate
    * only matters for compaction-disabled tables.
    */
  val PrunedReadMaxDeltaBytes: Long = 256L << 20

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
      deltaPaths: Seq[String],
      maxPrunedDeltaBytes: Long = PrunedReadMaxDeltaBytes): DataFrame = {
    if (deltaPaths.isEmpty) return base
    val cols = tableSchema.fieldNames.toSeq
    val deltas = spark.read.schema(deltaSchema(tableSchema)).parquet(deltaPaths: _*)

    // wipes are usually rare, but can be bulk (GDPR-style batch deletes)
    // — no broadcast hint; AQE broadcasts when the aggregate is small
    val wipes = deltas
      .filter(col("action") === NetAction.Wipe)
      .groupBy("conv_id")
      .agg(max("seq").as("wipe_seq"))

    // driver-side metadata only: decides the plan shape, runs no job
    val deltaBytes = deltaPaths.iterator.map { p =>
      val f = Paths.get(p)
      if (Files.exists(f)) Files.size(f) else 0L
    }.sum

    if (deltaBytes <= maxPrunedDeltaBytes) {
      // ---- pruned formulation: untouched base rows never shuffle ----
      // touched keys (point actions) and wiped conversations are both
      // O(changes); broadcast them so the base scan splits narrowly into
      // pass-through ∪ fold-input with NO exchange of untouched payloads
      val touchedKeys = deltas.filter(col("turn_idx").isNotNull)
        .select("conv_id", "turn_idx").distinct()
      val wipedConvs = wipes.select("conv_id")
      val passthrough = base
        .join(broadcast(wipedConvs), Seq("conv_id"), "left_anti")
        .join(broadcast(touchedKeys), Seq("conv_id", "turn_idx"), "left_anti")
      // a wiped-conv base row outside the touched-key set is simply gone
      // (its seq 0 always loses to the wipe); one that IS a touched key
      // goes through the fold, whose wipe join resolves it exactly
      val foldBase = base
        .join(broadcast(touchedKeys), Seq("conv_id", "turn_idx"), "left_semi")
      passthrough.select(cols.map(col): _*)
        .unionByName(fold(foldBase, deltas, wipes, cols))
    } else {
      fold(base, deltas, wipes, cols)
    }
  }

  /** Fold an explicit base-state DataFrame with an explicit delta-action
    * DataFrame into the resulting state — the feed consumer's
    * "roll the feed forward" primitive: given keyed state at version A
    * and the net actions committed in (A, B], produce the state at B
    * without reading it ([[graft.operators.IncrementalView]] uses this to
    * derive after-state from before-state + feed, saving a second state
    * read). `deltas` must have [[deltaSchema]] shape with `row` under
    * `tableSchema`; base rows rank at seq 0, so any delta in the range
    * supersedes them. Assumes keyed state semantics (at most one live row
    * per (conv_id, turn_idx)) — not applicable to append-only tables.
    */
  def foldState(base: DataFrame, deltas: DataFrame, tableSchema: StructType): DataFrame = {
    val wipes = deltas.filter(col("action") === NetAction.Wipe)
      .groupBy("conv_id").agg(max("seq").as("wipe_seq"))
    fold(base, deltas, wipes, tableSchema.fieldNames.toSeq)
  }

  /** The fold aggregation over (a subset of) base rows ∪ delta actions —
    * one hash-partitioned aggregation, the same shape and scale behavior
    * as the in-batch fold (SURVEY.md §2.A A5/A6).
    */
  private def fold(
      base: DataFrame, deltas: DataFrame, wipes: DataFrame, cols: Seq[String]): DataFrame = {
    val all = base
      .select(
        col("conv_id"), col("turn_idx"),
        lit(NetAction.Put).as("action"),
        struct(cols.map(col): _*).as("row"),
        lit(0L).as("seq"))
      .unionByName(deltas.select("conv_id", "turn_idx", "action", "row", "seq"))

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
