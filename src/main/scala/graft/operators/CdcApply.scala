package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.model.{MergeSpec, NetAction}
import graft.table.{IceLite, IceLiteTable, MorRead, SchemaEvolution}

/** Applies one batch (micro-batch or whole-log replay) of change events to
  * an IceLite transcripts table: validate → evolve schema → per-key fold →
  * then either
  *  - "mor" (default): APPEND the folded net actions as per-bucket delta
  *    files — O(changes) per commit, the reference's row-level-DML cost
  *    shape (`/root/reference/src/main/java/io/confluent/connect/jdbc/sink/BufferedRecords.java:294-336`)
  *    — folded into reads by [[graft.table.MorRead]], with amortized
  *    compaction back to base files; or
  *  - "cow": bucket-pruned copy-on-write rewrite of the affected buckets
  *    (kept for read-heavy tables; O(touched state) per commit).
  *
  * This is the engine's equivalent of the reference's
  * `JdbcDbWriter.write(records)` + per-put JDBC transaction
  * (`/root/reference/src/main/java/io/confluent/connect/jdbc/sink/JdbcDbWriter.java:60-84`),
  * with exactly-once obtained from idempotent epoch commits instead of
  * at-least-once + DB transactions: the snapshot property
  * `epoch:<streamId>` records the last applied batch id; a re-delivered
  * epoch is a no-op (`AlreadyApplied`).
  *
  * Per epoch the batch source is scanned once column-pruned (planning)
  * and once full-width (fold+write); the quarantine write runs only when
  * the planning aggregate saw rejects.
  */
object CdcApply {

  final case class BatchResult(
      snapshot: IceLite.Snapshot,
      skipped: Boolean,
      rowsWritten: Long,
      eventsSeen: Long,
      rejected: Long)

  private final case class AlreadyApplied(epoch: Long) extends Exception(s"epoch $epoch already applied")

  /** A concurrent writer committed between this batch's snapshot read and
    * its commit CAS (version moved or a delta seq was taken). Retried by
    * [[applyMor]] up to [[MorCommitRetries]] times — the analogue of the
    * reference's DDL race retry (`.../sink/DbStructure.java:203-227`).
    */
  private final case class CommitRaced(msg: String) extends Exception(msg)

  /** Bounded re-stage+re-commit attempts after a MOR commit race. Each
    * retry re-reads the parent, re-merges the schema, and re-stages the
    * delta files under the new seq (stage dirs are per-commit UUIDs, so
    * restaging never collides). Beyond this, two writers are livelocking
    * — fail loudly like the round-4 single-writer abort did.
    */
  val MorCommitRetries: Int = 5

  /** Total MOR commit races retried in this JVM (observability/test hook). */
  private[graft] val morRaceRetries = new java.util.concurrent.atomic.LongAdder

  /** Best-effort removal of an abandoned stage dir (race retry / skipped
    * epoch). The walk stream must be CLOSED — it holds directory fds, and
    * a long-lived streaming driver leaking one per contended commit works
    * toward EMFILE. Catches the UNCHECKED I/O wrappers too: Files.walk's
    * lazy iteration surfaces errors as UncheckedIOException /
    * DirectoryIteratorException, and this runs inside the AlreadyApplied
    * and CommitRaced handlers — a cleanup hiccup must never turn a
    * retryable race (or an idempotent skip) into an epoch failure.
    * Leftovers from a failed delete persist (never-referenced files are
    * invisible to snapshot-based GC) but are inert: stage dirs are
    * per-commit UUIDs, so nothing ever reads or collides with them.
    */
  private[operators] def dropStage(stage: java.nio.file.Path): Unit =
    try {
      import java.nio.file.{Files, Path}
      val walk = Files.walk(stage)
      try walk.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
      finally walk.close()
    } catch {
      case _: java.io.IOException => ()
      case _: java.io.UncheckedIOException => ()
      case _: java.nio.file.DirectoryIteratorException => ()
    }

  /** Test seam: runs once after the first staging, before the first
    * commit attempt — lets a spec deterministically interleave a second
    * writer's commit into the race window. Consumed on use.
    */
  private[graft] val testOnStaged =
    new java.util.concurrent.atomic.AtomicReference[() => Unit](null)

  /** Above this many series tombstones in one batch, the wipe set is no
    * longer broadcast into the fold/merge (a bulk GDPR-delete batch would
    * otherwise be a driver/executor memory hazard); the joins fall back
    * to shuffles and AQE still broadcasts if the aggregate turns out small.
    */
  val WipeBroadcastMax: Long = 100000L

  /** Write options applied to every data file: zstd + a bloom filter on
    * conv_id (reference analogue: PG bloom index,
    * `.../dialect/PostgreSqlDatabaseDialect.java:263-294`) with files
    * sorted by (conv_id, turn_idx) so parquet min/max row-group stats are
    * selective (reference analogue: zonemaps/BRIN,
    * `.../dialect/OracleDatabaseDialect.java:296-310`).
    */
  private val writeOptions: Map[String, String] = Map(
    "compression" -> "zstd",
    "parquet.bloom.filter.enabled#conv_id" -> "true")

  /** Apply `events` (envelope columns: partition, offset, ts, op, conv_id,
    * turn_idx, after, schema_v) to the table.
    *
    * @param epoch   (streamId, batchId) for exactly-once; None = ad-hoc batch
    * @param rejectedDir  where quarantined invalid records go (with _error
    *                     + lineage), the errant-record-reporter analogue.
    *                     Epoch-tagged batches overwrite their own epoch
    *                     partition on re-delivery (idempotent); ad-hoc
    *                     batches append (at-least-once).
    * @param auditRef write-audit-publish (B12): stage the batch's full
    *                     would-be snapshot under this audit name instead
    *                     of committing — the table pointer is untouched
    *                     until `table.publishAudit(name)`; audit queries
    *                     run on `table.readAudit`. MOR-only (like the
    *                     change feed); quarantine rows are written at
    *                     STAGE time (they are the record of the staging
    *                     act and re-staging overwrites them). Epoch
    *                     markers ride the staged snapshot and land only
    *                     at publish.
    * @param extraProps caller-supplied snapshot properties that ride the
    *                     SAME atomic commit as the batch (skipped batches
    *                     commit nothing, so they land exactly-once with
    *                     the epoch marker). Used by [[DeadLetter.replay]]
    *                     to record the consumed quarantine partitions so
    *                     a crash between commit and archive cannot
    *                     archive rows the commit never saw.
    */
  def applyBatch(
      spark: SparkSession,
      table: IceLiteTable,
      events: DataFrame,
      spec: MergeSpec = MergeSpec(),
      epoch: Option[(String, Long)] = None,
      rejectedDir: Option[String] = None,
      auditRef: Option[String] = None,
      extraProps: Map[String, String] = Map.empty): BatchResult = {

    // enum-valued spec fields fail loudly on a typo (a misspelled value
    // would otherwise silently select the fallback plan)
    require(Set("mor", "cow")(spec.mergeStrategy),
      s"mergeStrategy must be 'mor' or 'cow', got '${spec.mergeStrategy}'")
    require(auditRef.isEmpty || spec.mergeStrategy == "mor",
      "write-audit-publish stages MOR delta snapshots; mergeStrategy='cow' " +
        "rewrites shared bucket files in place and cannot stage an isolated audit")
    require(Set("agg", "join", "window")(spec.foldStrategy),
      s"foldStrategy must be 'agg', 'join' or 'window', got '${spec.foldStrategy}'")
    require(Set("key", "bucket")(spec.foldAlignment),
      s"foldAlignment must be 'key' or 'bucket', got '${spec.foldAlignment}'")

    val events0 = renamePayload(extractPayloadFields(whitelistFields(events, spec), spec), spec)

    val snap0 = table.current
    // Fast idempotence check (re-checked inside the commit CAS). A batch
    // id BELOW the high-water mark normally means re-delivery of an
    // already-committed epoch (no-op by contract); it can also mean a
    // deleted/reset checkpoint reused against an existing table with the
    // same streamId — reprocessing requires a NEW streamId, so warn.
    epoch.foreach { case (sid, bid) =>
      lastEpoch(snap0, sid).foreach { last =>
        if (last > bid)
          System.err.println(s"[graft] WARN epoch $bid for stream '$sid' is below the " +
            s"committed high-water mark $last — skipping. If this is a checkpoint reset " +
            s"meant to REPROCESS, use a new streamId (epochs are keyed by streamId).")
        if (last >= bid) return BatchResult(snap0, skipped = true, 0L, 0L, 0L)
      }
    }

    // --- schema evolution (ALTER-ADD semantics, SchemaEvolution rules) ---
    val tableSchema0 = org.apache.spark.sql.types.DataType.fromJson(snap0.schemaJson).asInstanceOf[StructType]
    val incoming = events0.schema("after").dataType.asInstanceOf[StructType]
    val evolved0 = SchemaEvolution.merge(tableSchema0, incoming) match {
      case Right(s) => s
      case Left(reason) => throw new IllegalArgumentException(s"schema rejected: $reason")
    }
    // reference `auto.evolve=false` (JdbcSinkConfig.java:145-150 +
    // DbStructure.amendIfNecessary): a batch whose records need an
    // ALTER-ADD fails the task instead of evolving the table
    if (!spec.autoEvolve && evolved0 != tableSchema0)
      throw new IllegalStateException(
        "auto.evolve=false: batch requires schema evolution (" +
          evolved0.fieldNames.diff(tableSchema0.fieldNames).mkString(", ") +
          ") — rejected, table schema unchanged")
    // kafka-coordinate lineage columns (reference `coordinates.enabled`)
    val evolved =
      if (!spec.coordinates) evolved0
      else StructType(evolved0.fields.filterNot(f => f.name == "_partition" || f.name == "_offset") ++ Seq(
        org.apache.spark.sql.types.StructField("_partition", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("_offset", org.apache.spark.sql.types.LongType)))

    // Scan-count note (r06): a MOR epoch runs (a) one NARROW planning
    // aggregate (partition/offset only — asserted in PlanSpec), (b) the
    // fold+write job (the one full-width scan, which also carries the
    // observed rejected-count metric), (c) a narrow wipe count + (when
    // wipes exist) a narrow wipe aggregate, and (d) a quarantine write
    // only when rejects were observed. Caching the tagged batch instead
    // was measured SLOWER at bench scale (24M events): building the
    // columnar cache of the full payload costs more than the narrow
    // re-scans it saves.
    val tagged = MergeEngine.tagErrors(events0, spec.deleteEnabled)
    locally {
      // --- planning: per-log-partition lineage (offsets advance past
      // errant records — quarantined, not retried,
      // `.../sink/JdbcSinkTaskTest.java:324-492`), volume + rejection +
      // series-tombstone counts, and (COW only) the touched-bucket set
      // (every action's conv_id comes from some batch event, so the
      // batch's distinct buckets are exactly the affected set — no fold
      // needed for planning).
      val isWipe = col("op") === "delete" && col("turn_idx").isNull && col("_error").isNull
      // COW planning aggregate (full form, _error-aware). NOTE (r06): any
      // aggregate referencing _error reads the ENTIRE after struct — the
      // validation rule `op =!= 'delete' && after.isNull` defeats nested-
      // schema pruning (IsNull over a struct prunes nothing), so this
      // scan decodes the payload. The MOR hot path therefore uses the
      // NARROW planning aggregate below plus an observed metric on the
      // fold's own full-width scan instead.
      def planAgg(): Array[org.apache.spark.sql.Row] = {
        val aggs = Seq(
          max("offset").as("max_off"),
          count(lit(1)).as("n"),
          sum(when(col("_error").isNotNull, 1L).otherwise(0L)).as("bad"),
          sum(when(isWipe, 1L).otherwise(0L)).as("n_wipes"),
          collect_set(when(col("_error").isNull,
            MergeEngine.bucketOf(col("conv_id"), snap0.numBuckets))).as("buckets"))
        tagged.groupBy("partition").agg(aggs.head, aggs.tail: _*).collect()
      }
      def writeQuarantine(rejectedCount: Long): Unit =
        if (rejectedCount > 0) rejectedDir.foreach { d =>
          val rej = tagged.filter(col("_error").isNotNull)
            .withColumn("_rejected_at_epoch", lit(epoch.map(_._2).getOrElse(-1L)))
          epoch match {
            case Some(_) =>
              // dynamic partition overwrite: a re-run of the same epoch
              // (crash between quarantine and commit) replaces its own
              // partition instead of duplicating rows
              rej.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_rejected_at_epoch").parquet(d)
            case None =>
              rej.write.mode("append")
                .partitionBy("_rejected_at_epoch").parquet(d)
          }
        }
      val valid = tagged.filter(col("_error").isNull).drop("_error")

      // Normalize action rows to the (possibly evolved) table schema:
      // missing columns → null, narrower types → up-cast. No-op when the
      // fold's row struct already matches the table schema exactly (the
      // steady state of every non-evolving stream): the per-row struct
      // rebuild is measurable CPU at replay scale and Catalyst does not
      // eliminate an identity CreateNamedStruct-over-GetStructField.
      def normalize(actions: DataFrame): DataFrame = {
        // exact match only (field names, types, nullability, metadata) —
        // any mismatch falls through to the rebuilding projection
        if (!spec.coordinates && actions.schema("row").dataType == evolved) return actions
        val rowFields = actions.schema("row").dataType.asInstanceOf[StructType].fieldNames.toSet
        val normRow = struct(evolved.fields.toSeq.map { f =>
          (f.name match {
            case "_partition" if spec.coordinates => col("src_partition").cast(f.dataType)
            case "_offset" if spec.coordinates    => col("src_offset").cast(f.dataType)
            case n if rowFields.contains(n)       => col(s"row.$n").cast(f.dataType)
            case _                                => lit(null).cast(f.dataType)
          }).as(f.name)
        }: _*)
        actions.withColumn("row", normRow)
      }

      val result = spec.mergeStrategy match {
        case "mor" =>
          // Planning and the delta write are independent jobs over the
          // same batch — the COMMIT needs the lineage, the write does
          // not (MOR appends; no bucket set needed up front). Submit
          // planning concurrently so its scan hides behind the write
          // instead of serializing in front of it (per-epoch Amdahl
          // region).
          import scala.concurrent.{Await, ExecutionContext, Future}
          import scala.concurrent.duration.Duration
          implicit val ec: ExecutionContext = ExecutionContext.global
          // NARROW planning aggregate (r06): per-partition lineage needs
          // only (partition, max_off, n) — none of which touch _error, so
          // the scan prunes to two envelope columns (the round-5 form
          // aggregated `bad` here, whose _error reference dragged the
          // FULL payload struct into this scan — measured ~39s of task
          // time per 12M-event epoch decoding text the planning job never
          // used). The rejected count now rides the fold job's own
          // full-width scan as an observed metric (below).
          // Job descriptions are thread-local: label each concurrent job
          // from its own thread so the UI/stage profile attributes them.
          val planF = Future {
            spark.sparkContext.setJobDescription("cdc: planning aggregate")
            try events0.groupBy("partition")
              .agg(max("offset").as("max_off"), count(lit(1)).as("n")).collect()
            finally spark.sparkContext.setJobDescription(null)
          }
          // Rejected-record count: a TOTAL, not per-partition — observed
          // on the fold's scan (no extra job, no extra payload decode)
          // when the fold reads the batch exactly once (foldStrategy
          // "window"/"agg"); the "join" fold scans the batch twice, which would
          // double-count an observed metric, so it keeps a dedicated
          // count job. Caveat (documented): observed metrics follow
          // accumulator semantics — a re-run shuffle stage after executor
          // loss could overcount; the >0 quarantine gate is unaffected
          // (zero stays zero) and the quarantine WRITE derives its rows
          // from `tagged`, not from this count.
          val (foldInput, rejectedCountF): (DataFrame, () => Long) =
            if (spec.foldStrategy != "join") { // agg and window both scan the batch exactly once
              val obs = org.apache.spark.sql.Observation()
              val v = tagged
                .observe(obs, sum(when(col("_error").isNotNull, 1L).otherwise(0L)).as("bad"))
                .filter(col("_error").isNull).drop("_error")
              // The metric can be LOST (not just zero): when the fold leg
              // materializes empty (all-wipe / all-reject / empty batch),
              // AQE's empty-relation propagation replaces the subtree and
              // the CollectMetrics node leaves the final plan — Spark 4's
              // ObservationManager then completes the observation with an
              // EMPTY row. Fall back to a dedicated count for exactly
              // those degenerate batches; steady-state epochs never pay it.
              (v, () => obs.get.get("bad") match {
                case Some(null) => 0L // observed node saw zero rows (empty batch)
                case Some(n)    => n.asInstanceOf[Long]
                case None       => tagged.filter(col("_error").isNotNull).count()
              })
            } else
              (valid, () => tagged.filter(col("_error").isNotNull).count())
          // The wipe-broadcast gate needs a count BEFORE the fold plan is
          // built (an unhinted wipe join materializes the payload side
          // into an extra shuffle even when AQE later converts it to
          // broadcast — measured, that shuffle is the regression). Use a
          // dedicated MINIMAL count: three narrow envelope columns, no
          // `after` access, overlapped with the planning scan. A delete
          // is a wipe candidate iff its key is sound and deletes are
          // admitted — exactly tagErrors' rule for op=delete.
          val nWipes =
            if (!spec.deleteEnabled) 0L
            else Await.result(
              Future {
                spark.sparkContext.setJobDescription("cdc: wipe count")
                try events0.filter(col("op") === "delete" && col("turn_idx").isNull &&
                  col("conv_id").isNotNull).count()
                finally spark.sparkContext.setJobDescription(null)
              },
              Duration.Inf)
          // The wipe aggregate has TWO consumers in the delta-write
          // action: the fold's wipe join (broadcast build) and the
          // wipe-marker union leg — without a persist each re-runs the
          // scan+aggregate over the batch (measured as two low-
          // concurrency stages per epoch). Persist the small
          // (deleted-conversations-sized) frame for the epoch; released
          // in the finally below.
          val wipes0 =
            if (nWipes == 0L)
              spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
                StructType(Seq(
                  org.apache.spark.sql.types.StructField("conv_id", org.apache.spark.sql.types.StringType),
                  org.apache.spark.sql.types.StructField("wipe_off", org.apache.spark.sql.types.LongType))))
            else
              // narrow equivalent of seriesWipes(valid): an op=delete row
              // is valid iff conv_id is non-null (the after-null and
              // turn-null rules never apply to deletes, and deletes are
              // admitted on this path — nWipes > 0 implies deleteEnabled),
              // so filtering events0 directly keeps the wipe scan off the
              // payload struct (seriesWipes(valid) read it via _error).
              // parts=8: see seriesWipes — the persisted frame otherwise
              // pins a shuffle.partitions-wide layout whose near-empty
              // cached partitions cost scheduling wall in every consumer.
              MergeEngine.seriesWipes(events0.filter(col("conv_id").isNotNull), parts = Some(8))
                .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            // the broadcast hint goes ONLY to the join consumers (the fold);
            // applyMor's wipe-marker projection is not a join, and a hinted
            // non-join frame makes Spark log "broadcast ... not part of a
            // join relation" every epoch
            val wipes = if (nWipes <= WipeBroadcastMax) broadcast(wipes0) else wipes0
            val aligned = if (spec.foldAlignment == "bucket") Some(snap0.numBuckets) else None
            val actions = spec.foldStrategy match {
              case "agg"    => MergeEngine.netActions(foldInput, wipes, aligned)
              case "window" => MergeEngine.netActionsViaWindow(foldInput, wipes, aligned)
              case _        => MergeEngine.netActionsViaJoin(foldInput, wipes)
            }
            applyMor(spark, table, snap0, normalize(actions), wipes0, evolved, epoch, planF,
              rejectedCountF, writeQuarantine, preAligned = aligned.isDefined,
              auditRef = auditRef, extraProps = extraProps)
          } finally if (nWipes > 0L) wipes0.unpersist(blocking = false)
        case _ =>
          val lineage = planAgg()
          val eventsSeen = lineage.map(_.getAs[Long]("n")).sum
          val rejectedCount = lineage.map(_.getAs[Long]("bad")).sum
          val nWipeEvents = lineage.map(_.getAs[Long]("n_wipes")).sum
          val touched = lineage.flatMap(_.getAs[scala.collection.Seq[Int]]("buckets")).toSet
          // same ordering rule as the MOR path: epoch-tagged rejects land
          // BEFORE the commit (idempotent via dynamic partition
          // overwrite); ad-hoc rejects APPEND and so wait for a
          // successful commit (a failed commit + re-apply would
          // double-count them otherwise)
          if (epoch.isDefined) writeQuarantine(rejectedCount)

          // series wipes: distributed aggregate over the batch — never
          // collected to the driver; broadcast into the fold/merge only
          // below the bulk-delete threshold. The (common) wipe-free batch
          // skips the aggregate + join stages entirely with an empty
          // literal relation (planning count is exact, from the lineage
          // aggregate).
          val wipes0 =
            if (nWipeEvents == 0L)
              spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
                StructType(Seq(
                  org.apache.spark.sql.types.StructField("conv_id", org.apache.spark.sql.types.StringType),
                  org.apache.spark.sql.types.StructField("wipe_off", org.apache.spark.sql.types.LongType))))
            else MergeEngine.seriesWipes(valid)
          val wipes = if (nWipeEvents <= WipeBroadcastMax) broadcast(wipes0) else wipes0

          val actions = spec.foldStrategy match {
            case "agg"    => MergeEngine.netActions(valid, wipes)
            case "window" => MergeEngine.netActionsViaWindow(valid, wipes)
            case _        => MergeEngine.netActionsViaJoin(valid, wipes)
          }

          if (touched.isEmpty) {
            // Nothing to merge (e.g. all events invalid) — still commit the
            // epoch marker so re-delivery stays a no-op. No buckets touched
            // ⇒ the race check is vacuous; only re-delivery can abort.
            val snap =
              try commitSnapshot(table, snap0, Map.empty, touched, evolved, epoch, lineage,
                0L, eventsSeen, rejectedCount, extraProps)
              catch {
                case AlreadyApplied(_) => return BatchResult(table.current, skipped = true, 0L, 0L, 0L)
              }
            if (epoch.isEmpty) writeQuarantine(rejectedCount)
            return BatchResult(snap, skipped = false, 0L, eventsSeen, rejectedCount)
          }
          val r = applyCow(spark, table, normalize(actions), wipes, touched, evolved, spec, epoch, lineage,
            eventsSeen, rejectedCount, nbPlan = snap0.numBuckets, extraProps = extraProps)
          if (epoch.isEmpty) writeQuarantine(rejectedCount)
          r
      }
      // amortized copy-on-write moment: fold delta-heavy buckets back to
      // base files (bounds read-time merge work; per-batch write cost
      // stays O(changes + state/threshold) amortized). Budgeted: at most
      // morCompactBudget buckets per epoch so a synchronized threshold
      // crossing can never stall an epoch with a full-table rewrite.
      if (spec.mergeStrategy == "mor" && spec.morCompactThreshold > 0) {
        val budget =
          if (spec.morCompactBudget > 0) spec.morCompactBudget
          else if (spec.morCompactBudget < 0) Int.MaxValue
          else // auto: the sustainable steady-state rate when every epoch
               // touches every bucket (inflow numBuckets deltas/epoch)
            math.max(1, (table.numBuckets + spec.morCompactThreshold - 1) / spec.morCompactThreshold)
        table.compactDeltas(spark, spec.morCompactThreshold,
          maxBuckets = budget, stagger = spec.morCompactStagger)
      }
      result
    }
  }

  /** Merge-on-read write: net actions + wipe markers land as delta files
    * partitioned by bucket, sequenced by the committing snapshot version.
    */
  private def applyMor(
      spark: SparkSession,
      table: IceLiteTable,
      snap0: IceLite.Snapshot,
      normActions: DataFrame,
      wipes: DataFrame,
      evolved: StructType,
      epoch: Option[(String, Long)],
      lineageF: scala.concurrent.Future[Array[org.apache.spark.sql.Row]],
      rejectedCountF: () => Long,
      quarantine: Long => Unit,
      preAligned: Boolean,
      auditRef: Option[String] = None,
      extraProps: Map[String, String] = Map.empty): BatchResult = {

    // the bucket layout this batch stages under, pinned ONCE: the commit
    // retry loop re-reads the parent, and if a rebucket landed meanwhile
    // the staged bucket assignment is stale — fenced below, never retried
    val nb0 = snap0.numBuckets

    val wipeRows = wipes.select(
      col("conv_id"),
      lit(null).cast("int").as("turn_idx"),
      lit(NetAction.Wipe).as("action"),
      lit(null).cast(evolved).as("row"))
      .withColumn("bucket", MergeEngine.bucketOf(col("conv_id"), nb0))
    // Bucket-aligned actions (MergeSpec.foldAlignment="bucket", flagged
    // explicitly by the caller) arrive already exchanged + grouped on
    // the bucket key: write them AS IS — each task holds exactly one
    // bucket, so partitionBy emits one delta file per touched bucket
    // with no further exchange. Key-aligned actions need the write-side
    // redistribution (AQE rebalance: hot buckets split, cold coalesce).
    val actionRows =
      if (preAligned)
        normActions.select(col("bucket"), col("conv_id"), col("turn_idx"), col("action"), col("row"))
      else normActions
        .select(col("conv_id"), col("turn_idx"), col("action"), col("row"))
        .withColumn("bucket", MergeEngine.bucketOf(col("conv_id"), nb0))
    // Delta files are TRANSIENT (folded into zstd'd, sorted, bloom'd base
    // files at compaction): write them LSM-L0 style — light compression,
    // no sort, no bloom. MOR readers scan a touched bucket's deltas fully
    // anyway (only the bucket= dir prunes), so row-group stats/sort order
    // buy nothing here and the zstd+sort CPU was the largest block of the
    // per-epoch profile. Rows are seq-stamped per attempt: the commit CAS
    // rejects a stolen seq, and a retry re-stages under the new one.
    def stageDeltas(seq: Long): (java.nio.file.Path, Map[Int, Seq[String]], Long) = {
      val deltaRows = actionRows.unionByName(wipeRows).withColumn("seq", lit(seq))
      val stage = table.newStageDir()
      spark.sparkContext.setJobDescription(s"cdc: fold + delta write (seq $seq)")
      try (if (preAligned) deltaRows
       else deltaRows.hint("rebalance", "bucket")) // AQE splits hot buckets, coalesces cold
        .write.mode("overwrite")
        .option("compression", "snappy")
        .partitionBy("bucket")
        .parquet(stage.toString)
      finally spark.sparkContext.setJobDescription(null)
      val staged = table.stagedFilesByBucket(stage)
      val rowsWritten = footerRowCount(spark, staged.values.flatten.map(r => s"${table.dir}/$r"))
      (stage, staged, rowsWritten)
    }
    // single-writer sequence: rows are stamped before the commit, so a
    // racing writer (which would steal this version) fails the CAS check
    // and this batch re-stages against the new parent (bounded retries)
    var parent0 = snap0
    var schemaNow = evolved
    var (stage, staged, rowsWritten) = stageDeltas(parent0.version + 1)
    Option(testOnStaged.getAndSet(null)).foreach(_.apply())

    // planning ran concurrently with the delta write; join it here — the
    // commit is the first consumer of the lineage
    val lineage = scala.concurrent.Await.result(lineageF, scala.concurrent.duration.Duration.Inf)
    val eventsSeen = lineage.map(_.getAs[Long]("n")).sum
    // observed on the fold scan of the staging above (agg fold) or a
    // dedicated count (join fold) — ready by the time staging completed
    val rejectedCount = rejectedCountF()

    // Epoch-tagged batches quarantine BEFORE the commit: a crash between
    // commit and a post-commit quarantine write would lose the rejects
    // permanently (re-delivery is skipped by the epoch marker, so the
    // dead-letter write never re-runs), and the epoch-partition dynamic
    // overwrite makes a crash-between-quarantine-and-commit re-run
    // idempotent. Ad-hoc batches (no epoch) APPEND their quarantine and
    // have no re-delivery marker — pre-commit writes would duplicate
    // rejects when a failed commit is re-applied, so they write after a
    // successful commit (the caller owns the retry decision).
    if (epoch.isDefined) quarantine(rejectedCount)

    var attempt = 0
    while (true) {
      val seq = parent0.version + 1
      try {
        val buildChild: IceLite.Snapshot => IceLite.Snapshot = { parent =>
          epoch.foreach { case (sid, bid) =>
            if (lastEpoch(parent, sid).exists(_ >= bid)) throw AlreadyApplied(bid)
          }
          if (parent.version != parent0.version || parent.lastDeltaSeq >= seq)
            throw CommitRaced(
              s"MOR commit raced on ${table.dir}: staged seq $seq vs parent " +
                s"version ${parent.version} (lastDeltaSeq ${parent.lastDeltaSeq})")
          parent.copy(
            schemaJson = schemaNow.json,
            deltas = parent.deltas ++ staged.map { case (b, fs) =>
              b -> (parent.deltas.getOrElse(b, Seq.empty) ++ fs)
            },
            lastDeltaSeq = seq,
            properties = parent.properties ++ offsetProps(parent, lineage) ++ epochProps(epoch) ++ extraProps,
            metrics = Map(
              "rowsWritten" -> rowsWritten,
              "deltaFilesAdded" -> staged.values.map(_.size.toLong).sum,
              "eventsApplied" -> eventsSeen,
              "rejected" -> rejectedCount))
        }
        // Audit staging (B12) evaluates the SAME child-building callback —
        // epoch-redelivery skip and race fences included — but writes the
        // result under the audit name instead of the CAS pointer. A race
        // during staging retries exactly like a commit race (the audit
        // must describe current+batch at publish time).
        val snap = auditRef match {
          case Some(an) => table.stageAudit(an, buildChild)
          case None     => table.commit(buildChild)
        }
        if (epoch.isEmpty) quarantine(rejectedCount)
        return BatchResult(snap, skipped = false, rowsWritten, eventsSeen, rejectedCount)
      } catch {
        case AlreadyApplied(_) =>
          dropStage(stage)
          return BatchResult(table.current, skipped = true, 0L, 0L, 0L)
        case CommitRaced(msg) =>
          attempt += 1
          dropStage(stage)
          if (attempt > MorCommitRetries)
            throw new IllegalStateException(
              s"$msg — still racing after $MorCommitRetries re-stage attempts; " +
                "a concurrent writer is livelocking this table, re-apply the batch manually.")
          morRaceRetries.increment()
          parent0 = table.current
          // rebucket fence: the re-stage below re-uses actionRows, whose
          // bucket column was computed under nb0 — committing it against
          // a re-bucketed parent would land rows in wrong buckets
          if (parent0.numBuckets != nb0)
            throw new IllegalStateException(
              s"table ${table.dir} was re-bucketed ($nb0 -> ${parent0.numBuckets}) while " +
                "this batch was staged under the old layout — re-apply the batch")
          // the racer may have evolved the schema: merge ours over the
          // committed one (delta rows keep THIS batch's struct — readers
          // widen missing nested fields to null, ALTER-ADD semantics)
          schemaNow = SchemaEvolution.merge(
            org.apache.spark.sql.types.DataType.fromJson(parent0.schemaJson).asInstanceOf[StructType],
            schemaNow) match {
            case Right(s) => s
            case Left(reason) => throw new IllegalStateException(
              s"MOR race retry: concurrent writer's schema is incompatible: $reason")
          }
          System.err.println(s"[graft] MOR commit race on ${table.dir} (attempt $attempt/" +
            s"$MorCommitRetries): re-staging against parent v${parent0.version}")
          val t = stageDeltas(parent0.version + 1)
          stage = t._1; staged = t._2; rowsWritten = t._3
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Copy-on-write merge of affected buckets (pre-MOR default, kept for
    * read-heavy tables): fold output is joined against the bucket's base
    * rows and the bucket content is rewritten.
    */
  private def applyCow(
      spark: SparkSession,
      table: IceLiteTable,
      normActions: DataFrame,
      wipes: DataFrame,
      touched: Set[Int],
      evolved: StructType,
      spec: MergeSpec,
      epoch: Option[(String, Long)],
      lineage: Array[org.apache.spark.sql.Row],
      eventsSeen: Long,
      rejectedCount: Long,
      nbPlan: Int,
      extraProps: Map[String, String] = Map.empty): BatchResult = {

    // COW applies on top of the CURRENT state: any outstanding MOR deltas
    // of the touched buckets are folded in first (strategy hand-off).
    // The base snapshot is PINNED (`cur`) and the commit verifies the
    // touched buckets are unchanged between it and the commit parent —
    // without the check, IceLite.commit's CAS loop would happily replace
    // a touched bucket a concurrent writer just rewrote, silently losing
    // that writer's rows (the COW twin of the MOR seq race). A detected
    // race re-reads, re-merges and re-stages (bounded retries).
    var cur = table.current
    // rebucket fence, COW flavor: `touched` was computed under nbPlan
    // (the planning snapshot's layout) — a rebucket landing anywhere
    // between planning and commit would make the bucket replacement
    // (and the staged bucket column) wrong, so abort instead of staging
    // or retrying against a moved layout
    val nb0 = nbPlan
    if (cur.numBuckets != nb0)
      throw new IllegalStateException(
        s"table ${table.dir} was re-bucketed ($nb0 -> ${cur.numBuckets}) while this " +
          "batch was planned under the old layout — re-apply the batch")
    var attempt = 0
    while (true) {
      // Schema is re-merged over `cur` EVERY iteration (not just after a
      // detected race): a concurrent schema-evolving commit can land
      // between applyBatch's snap0 read and this point — reading the
      // touched buckets with the pre-evolution schema would silently drop
      // that writer's new column from the rewritten files.
      val schemaNow = SchemaEvolution.merge(
        org.apache.spark.sql.types.DataType.fromJson(cur.schemaJson).asInstanceOf[StructType],
        evolved) match {
        case Right(s) => s
        case Left(reason) => throw new IllegalStateException(
          s"COW apply: concurrent writer's schema is incompatible: $reason")
      }
      val base = {
        val files = table.resolve(cur.files, Some(touched))
        val b =
          if (files.isEmpty)
            spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schemaNow)
          else spark.read.schema(schemaNow).parquet(files: _*)
        val deltaPaths = table.resolve(cur.deltas, Some(touched))
        if (deltaPaths.isEmpty) b else MorRead.merged(spark, schemaNow, b, deltaPaths)
      }
      // action rows were normalized to the pre-race schema; pad any
      // racer-added columns with null so the merge projection resolves
      val actionsNow = {
        val rowT = normActions.schema("row").dataType.asInstanceOf[StructType]
        if (rowT == schemaNow) normActions
        else {
          val have = rowT.fieldNames.toSet
          normActions.withColumn("row", struct(schemaNow.fields.toSeq.map { f =>
            (if (have.contains(f.name)) col(s"row.`${f.name}`").cast(f.dataType)
             else lit(null).cast(f.dataType)).as(f.name)
          }: _*))
        }
      }
      val merged = MergeEngine.merge(base, actionsNow, wipes)

      val stage = table.newStageDir()
      // Skew-aware write partitioning (MergeSpec.writeSalts): a hot
      // conversation (Zipf head) concentrates in one bucket; partitioning
      // the write by bucket alone would make that bucket a straggler task.
      // Default = AQE rebalance (hot partitions split, cold coalesce);
      // fixed salting available for extreme known skew. Files stay
      // bucket-pure via partitionBy, so pruning is unaffected. AQE handles
      // the join side; this handles the write side.
      val withBucket = merged.withColumn("bucket", MergeEngine.bucketOf(col("conv_id"), nb0))
      val partitioned = spec.writeSalts match {
        case 0 => withBucket.hint("rebalance", "bucket") // AQE splits hot buckets, coalesces cold
        case 1 => withBucket.repartition(col("bucket"))
        case k => withBucket.repartition(col("bucket"),
          pmod(xxhash64(col("conv_id"), col("turn_idx")), lit(k.toLong)))
      }
      partitioned
        .sortWithinPartitions("bucket", "conv_id", "turn_idx")
        .write.mode("overwrite").options(writeOptions)
        .partitionBy("bucket")
        .parquet(stage.toString)

      val staged = table.stagedFilesByBucket(stage)
      // rows-written metric from parquet footers, read driver-side — no
      // Spark job (the reference's update-count == expected check,
      // `.../sink/BufferedRecords.java:262-273`, as a commit metric)
      val rowsWritten = footerRowCount(spark, staged.values.flatten.map(r => s"${table.dir}/$r"))
      if (attempt == 0) Option(testOnStaged.getAndSet(null)).foreach(_.apply())

      try {
        val snap = commitSnapshot(table, cur, staged, touched, schemaNow, epoch, lineage,
          rowsWritten, eventsSeen, rejectedCount, extraProps)
        return BatchResult(snap, skipped = false, rowsWritten, eventsSeen, rejectedCount)
      } catch {
        case AlreadyApplied(_) =>
          dropStage(stage)
          return BatchResult(table.current, skipped = true, 0L, 0L, 0L)
        case CommitRaced(msg) =>
          attempt += 1
          dropStage(stage) // a COW stage is O(bucket state) — never orphan it to GC
          if (attempt > MorCommitRetries)
            throw new IllegalStateException(
              s"$msg — still racing after $MorCommitRetries re-merge attempts; " +
                "a concurrent writer is livelocking this table, re-apply the batch manually.")
          morRaceRetries.increment()
          cur = table.current // loop head re-merges the schema from it
          if (cur.numBuckets != nb0)
            throw new IllegalStateException(
              s"table ${table.dir} was re-bucketed ($nb0 -> ${cur.numBuckets}) while " +
                "this batch was staged under the old layout — re-apply the batch")
          System.err.println(s"[graft] COW commit race on ${table.dir} (attempt $attempt/" +
            s"$MorCommitRetries): re-merging against v${cur.version}")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Ingest-time payload-field extraction + multi-schema classification:
    * widen the after-struct with `get_json_object(after.<extractSource>,
    * path)` columns, typed per ExtractField.castTo — pure codegen'd column
    * expressions, evaluated inside the one full-width batch scan (no extra
    * job, no UDF). The reference does this as converter/SMT config before
    * binding (README.md:97-102 extraction, :55-73 schema names,
    * :152-161 casting).
    *
    * Extraction failures (cast failure on a non-null raw value; no payload
    * schema matched) are carried in a nullable `_extract_error` column that
    * [[MergeEngine.tagErrors]] folds into the quarantine `_error`.
    */
  private def extractPayloadFields(events: DataFrame, spec: MergeSpec): DataFrame = {
    import graft.model.{ExtractField, PayloadSchema}
    require(spec.extractFields.isEmpty || spec.payloadSchemas.isEmpty,
      "configure either extractFields (single-schema) or payloadSchemas (multi-schema), not both")
    if (spec.extractFields.isEmpty && spec.payloadSchemas.isEmpty) events
    else {
      val afterT = events.schema("after").dataType.asInstanceOf[StructType]
      val src = col(s"after.`${spec.extractSource}`")

      // union of target columns in first-seen order; each name must have
      // ONE type across schemas (it becomes one table column)
      val allFields: Seq[ExtractField] =
        if (spec.payloadSchemas.isEmpty) spec.extractFields
        else {
          spec.payloadSchemas.foreach { ps =>
            val d = ps.extract.map(_.name).diff(ps.extract.map(_.name).distinct)
            require(d.isEmpty,
              s"payload schema '${ps.name}' declares duplicate extract names: ${d.distinct.mkString(", ")}")
          }
          val seen = scala.collection.mutable.LinkedHashMap.empty[String, ExtractField]
          for (s <- spec.payloadSchemas; f <- s.extract) seen.get(f.name) match {
            case Some(prev) => require(prev.castTo == f.castTo,
              s"extract column '${f.name}' declared as ${prev.castTo} and ${f.castTo} in different schemas")
            case None => seen(f.name) = f
          }
          if (!spec.allowNonIndexed) {
            val names = spec.payloadSchemas.map(s => s.extract.map(_.name).toSet)
            require(names.forall(_ == names.head),
              "allowNonIndexed=false requires every payload schema to extract the same target columns " +
                s"(got ${spec.payloadSchemas.map(s => s"${s.name}:${s.extract.map(_.name).mkString("+")}").mkString(", ")})")
          }
          seen.values.toSeq
        }
      val dupes = allFields.map(_.name).diff(allFields.map(_.name).distinct)
      require(dupes.isEmpty, s"duplicate extract column names: ${dupes.distinct.mkString(", ")}")
      val collisions = allFields.map(_.name).toSet.intersect(afterT.fieldNames.toSet)
      require(collisions.isEmpty,
        s"extract column names collide with existing payload fields: ${collisions.mkString(", ")} " +
          "— extracted columns must not shadow envelope fields (rename the extract target)")

      def typed(f: ExtractField, raw: Column): Column =
        if (f.castTo == "string") raw else raw.try_cast(f.castTo)
      def castErr(f: ExtractField, raw: Column, gate: Column): Seq[(Column, String)] =
        if (f.castTo == "string") Nil
        else Seq((gate && raw.isNotNull && typed(f, raw).isNull,
          s"extract cast failure: ${f.name} as ${f.castTo}"))

      val (extracted: Seq[Column], errors: Seq[(Column, String)]) =
        if (spec.payloadSchemas.isEmpty) {
          val raws = spec.extractFields.map(f => f -> get_json_object(src, f.path))
          (raws.map { case (f, raw) => typed(f, raw).as(f.name) },
            raws.flatMap { case (f, raw) => castErr(f, raw, lit(true)) })
        } else {
          // first-match classification: schemaName = first schema whose
          // matchPath is present in the payload
          def matches(s: PayloadSchema): Column = get_json_object(src, s.matchPath).isNotNull
          val schemaName = coalesce(
            spec.payloadSchemas.map(s => when(matches(s), lit(s.name))) :+ lit(null).cast("string"): _*)
          val perField = allFields.map { f =>
            val variants = spec.payloadSchemas.flatMap { s =>
              s.extract.find(_.name == f.name).map(sf => (s, get_json_object(src, sf.path)))
            }
            val value = coalesce(variants.map { case (s, raw) =>
              when(schemaName === s.name, typed(f, raw))
            } :+ lit(null).cast(f.castTo): _*)
            val errs = variants.flatMap { case (s, raw) => castErr(f, raw, schemaName === s.name) }
            (value.as(f.name), errs)
          }
          (perField.map(_._1),
            (schemaName.isNull, "no payload schema matched") +: perField.flatMap(_._2))
        }

      val extractError = errors
        .foldLeft(when(col("after").isNull, lit(null).cast("string"))) { case (acc, (cond, msg)) =>
          acc.when(cond, msg)
        }
        .otherwise(null)
      val keep = afterT.fieldNames.toSeq.map(n => col(s"after.`$n`").as(n))
      events
        .withColumn("after", when(col("after").isNotNull, struct(keep ++ extracted: _*)))
        .withColumn("_extract_error", extractError)
    }
  }

  /** Field names of `afterT` surviving the whitelist projection: keys ∪
    * whitelist ∪ spec-referenced columns (event-side names).
    */
  private def whitelistKeep(afterT: StructType, spec: MergeSpec): Seq[String] = {
    val specCols: Set[String] =
      if (spec.extractFields.nonEmpty || spec.payloadSchemas.nonEmpty ||
        (spec.payloadTargetName.nonEmpty && spec.payloadTargetName != spec.extractSource))
        Set(spec.extractSource)
      else Set.empty
    afterT.fieldNames.toSeq.filter(n =>
      spec.upsertKeys.contains(n) || spec.deleteKeys.contains(n) ||
        spec.fieldsWhitelist.contains(n) || specCols.contains(n))
  }

  /** The after-struct SHAPE surviving [[whitelistFields]] — for
    * first-sight table creation (CdcStream), so a created state or
    * event-log table never carries non-whitelisted columns at all.
    */
  private[graft] def whitelistedStruct(afterT: StructType, spec: MergeSpec): StructType =
    if (spec.fieldsWhitelist.isEmpty) afterT
    else {
      val keep = whitelistKeep(afterT, spec).toSet
      StructType(afterT.fields.filter(f => keep.contains(f.name)))
    }

  /** Ingest-time value-field whitelist (reference `fields.whitelist`,
    * `.../sink/metadata/FieldsMetadata.java:79-162`): project the
    * after-struct down to keys ∪ whitelist ∪ spec-referenced columns.
    * Runs BEFORE extraction (which reads [[MergeSpec.extractSource]] —
    * kept implicitly while extraction or the payload rename is
    * configured, same rule as the routed-slice projection) and before
    * schema evolution, so dropped fields never become table columns.
    * Pure struct re-projection inside the batch scan — no job, and
    * Catalyst prunes the dropped leaves out of the parquet scan.
    */
  private[operators] def whitelistFields(events: DataFrame, spec: MergeSpec): DataFrame =
    if (spec.fieldsWhitelist.isEmpty) events
    else {
      val afterT = events.schema("after").dataType.asInstanceOf[StructType]
      val keep = whitelistKeep(afterT, spec)
      if (keep.size == afterT.fields.length) events
      else events.withColumn("after",
        when(col("after").isNotNull, struct(keep.map(n => col(s"after.`$n`").as(n)): _*)))
    }

  /** Payload target-column rename (reference
    * `value.converter.payload.field.name`, README.md:97-102): the event's
    * payload field ([[MergeSpec.extractSource]]) lands in the table under
    * [[MergeSpec.payloadTargetName]]. Pure struct re-projection inside the
    * batch scan (no job); runs AFTER extraction, which reads the
    * event-side name. Field order is preserved so the rename is an
    * in-place column retitle, not a layout change.
    */
  private def renamePayload(events: DataFrame, spec: MergeSpec): DataFrame =
    if (spec.payloadTargetName.isEmpty || spec.payloadTargetName == spec.extractSource) events
    else {
      val afterT = events.schema("after").dataType.asInstanceOf[StructType]
      require(afterT.fieldNames.contains(spec.extractSource),
        s"payloadTargetName rename: source column '${spec.extractSource}' not in the after-struct " +
          s"(${afterT.fieldNames.mkString(", ")})")
      require(!afterT.fieldNames.contains(spec.payloadTargetName),
        s"payloadTargetName '${spec.payloadTargetName}' collides with an existing payload field")
      val cols = afterT.fieldNames.toSeq.map { n =>
        val target = if (n == spec.extractSource) spec.payloadTargetName else n
        col(s"after.`$n`").as(target)
      }
      events.withColumn("after", when(col("after").isNotNull, struct(cols: _*)))
    }

  /** Sum of row counts from parquet footers (driver-side metadata reads,
    * fanned out on a thread pool — one file per bucket per epoch adds up,
    * and each footer open is latency-bound, not CPU-bound).
    */
  private[operators] def footerRowCount(spark: SparkSession, paths: Iterable[String]): Long = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val conf = spark.sessionState.newHadoopConf()
    implicit val ec: ExecutionContext = ExecutionContext.global
    val counts = paths.toSeq.map { p =>
      Future {
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(p), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getFooter.getBlocks.asScala.map(_.getRowCount.toLong).sum
        finally r.close()
      }
    }
    Await.result(Future.sequence(counts), Duration.Inf).sum
  }

  private def lastEpoch(s: IceLite.Snapshot, streamId: String): Option[Long] =
    s.properties.get(s"epoch:$streamId").map(_.toLong)

  private def offsetProps(parent: IceLite.Snapshot, lineage: Array[org.apache.spark.sql.Row]): Map[String, String] =
    lineage.map { r =>
      val p = r.getAs[Int]("partition")
      val prev = parent.properties.get(s"maxoff:$p").map(_.toLong).getOrElse(Long.MinValue)
      s"maxoff:$p" -> math.max(prev, r.getAs[Long]("max_off")).toString
    }.toMap

  private def epochProps(epoch: Option[(String, Long)]): Map[String, String] =
    epoch.map { case (sid, bid) => s"epoch:$sid" -> bid.toString }.toMap

  /** COW commit: replace the touched buckets' file lists. Throws
    * [[AlreadyApplied]] on epoch re-delivery and [[CommitRaced]] when a
    * concurrent commit changed a touched bucket (base files OR deltas)
    * after `cur` was read — the staged rewrite was computed from stale
    * state and replacing the bucket would silently drop the racer's rows.
    * Callers own the catch (applyCow re-merges; the empty-touch path
    * cannot race by construction).
    */
  private def commitSnapshot(
      table: IceLiteTable,
      cur: IceLite.Snapshot,
      staged: Map[Int, Seq[String]],
      touched: Set[Int],
      evolved: StructType,
      epoch: Option[(String, Long)],
      lineage: Array[org.apache.spark.sql.Row],
      rowsWritten: Long,
      eventsSeen: Long,
      rejected: Long,
      extraProps: Map[String, String] = Map.empty): IceLite.Snapshot =
    table.commit { parent =>
      epoch.foreach { case (sid, bid) =>
        if (lastEpoch(parent, sid).exists(_ >= bid)) throw AlreadyApplied(bid)
      }
      // Rebucket fence, in the one place that sees the true commit parent:
      // the staged files' bucket column was computed under cur.numBuckets.
      // A rebucket landing between the base read and this CAS moves every
      // row, but when the touched buckets are empty on BOTH sides (a batch
      // of brand-new conversations) the per-bucket stale check below cannot
      // see it — without this check the commit would publish old-layout
      // files into a new-layout snapshot and bucket-pruned reads would
      // miss the rows. CommitRaced (not a direct abort) so the caller's
      // retry path drops the stage dir first; its own nb fence then
      // escalates with the re-apply message. Marker-only commits
      // (touched and staged both empty — the epoch-only path, which does
      // not catch CommitRaced) carry no bucketed rows and are exempt.
      if ((touched.nonEmpty || staged.nonEmpty) && parent.numBuckets != cur.numBuckets)
        throw CommitRaced(
          s"COW commit raced on ${table.dir}: table was re-bucketed " +
            s"(${cur.numBuckets} -> ${parent.numBuckets}) while this batch was staged")
      val stale = touched.filter(b =>
        parent.files.get(b) != cur.files.get(b) || parent.deltas.get(b) != cur.deltas.get(b))
      if (stale.nonEmpty)
        throw CommitRaced(
          s"COW commit raced on ${table.dir}: buckets ${stale.toSeq.sorted.mkString(",")} " +
            s"changed between base read (v${cur.version}) and commit (parent v${parent.version})")
      // The touched-bucket check admits a concurrent commit to DISJOINT
      // buckets (correct: no data conflict) — but that commit may have
      // evolved the schema, so the published schema must merge OVER the
      // fresh parent's, never overwrite it with this batch's older view.
      val schemaOut = SchemaEvolution.merge(
        org.apache.spark.sql.types.DataType.fromJson(parent.schemaJson).asInstanceOf[StructType],
        evolved) match {
        case Right(s) => s
        case Left(reason) => throw new IllegalStateException(
          s"COW commit: concurrent writer's schema is incompatible: $reason")
      }
      val newFiles = (parent.files -- touched.toSeq) ++
        staged ++
        // a touched bucket whose merge produced no rows becomes empty
        (touched -- staged.keySet).map(_ -> Seq.empty[String]).toMap
      parent.copy(
        schemaJson = schemaOut.json,
        files = newFiles.filter(_._2.nonEmpty),
        // the COW rewrite folded any outstanding deltas of these buckets
        deltas = (parent.deltas -- touched.toSeq).filter(_._2.nonEmpty),
        properties = parent.properties ++ offsetProps(parent, lineage) ++ epochProps(epoch) ++ extraProps,
        metrics = Map(
          "rowsWritten" -> rowsWritten,
          "bucketsRewritten" -> touched.size.toLong,
          "eventsApplied" -> eventsSeen,
          "rejected" -> rejected))
    }
}
