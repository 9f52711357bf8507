package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, LongType, IntegerType}

import graft.model.MergeSpec
import graft.table.{IceLite, IceLiteTable, SchemaEvolution}

/** Applies one batch (micro-batch or whole-log replay) of change events to
  * an IceLite transcripts table: validate → evolve schema → per-key fold →
  * bucket-pruned copy-on-write merge → atomic snapshot commit.
  *
  * This is the engine's equivalent of the reference's
  * `JdbcDbWriter.write(records)` + per-put JDBC transaction
  * (`/root/reference/src/main/java/io/confluent/connect/jdbc/sink/JdbcDbWriter.java:60-84`),
  * with exactly-once obtained from idempotent epoch commits instead of
  * at-least-once + DB transactions: the snapshot property
  * `epoch:<streamId>` records the last applied batch id; a re-delivered
  * epoch is a no-op (`AlreadyApplied`).
  */
object CdcApply {

  final case class BatchResult(
      snapshot: IceLite.Snapshot,
      skipped: Boolean,
      rowsWritten: Long,
      eventsSeen: Long,
      rejected: Long)

  private final case class AlreadyApplied(epoch: Long) extends Exception(s"epoch $epoch already applied")

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
    *                     + lineage), the errant-record-reporter analogue
    */
  def applyBatch(
      spark: SparkSession,
      table: IceLiteTable,
      events: DataFrame,
      spec: MergeSpec = MergeSpec(),
      epoch: Option[(String, Long)] = None,
      rejectedDir: Option[String] = None): BatchResult = {

    val snap0 = table.current
    // Fast idempotence check (re-checked inside the commit CAS).
    epoch.foreach { case (sid, bid) =>
      if (lastEpoch(snap0, sid).exists(_ >= bid))
        return BatchResult(snap0, skipped = true, 0L, 0L, 0L)
    }

    val vb = MergeEngine.validate(events, spec.deleteEnabled)
    rejectedDir.foreach { d =>
      vb.rejected
        .withColumn("_rejected_at_epoch", lit(epoch.map(_._2).getOrElse(-1L)))
        .write.mode("append").parquet(d)
    }

    // --- schema evolution (ALTER-ADD semantics, SchemaEvolution rules) ---
    val tableSchema0 = org.apache.spark.sql.types.DataType.fromJson(snap0.schemaJson).asInstanceOf[StructType]
    val incoming = events.schema("after").dataType.asInstanceOf[StructType]
    val evolved0 = SchemaEvolution.merge(tableSchema0, incoming) match {
      case Right(s) => s
      case Left(reason) => throw new IllegalArgumentException(s"schema rejected: $reason")
    }
    // kafka-coordinate lineage columns (reference `coordinates.enabled`)
    val evolved =
      if (!spec.coordinates) evolved0
      else StructType(evolved0.fields.filterNot(f => f.name == "_partition" || f.name == "_offset") ++ Seq(
        org.apache.spark.sql.types.StructField("_partition", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("_offset", org.apache.spark.sql.types.LongType)))

    val valid = vb.valid

    // --- ONE planning job over the batch: per-log-partition lineage
    // (offsets advance past errant records — quarantined, not retried,
    // `.../sink/JdbcSinkTaskTest.java:324-492`), volume + rejection
    // counts, the touched-bucket set (every action's conv_id comes from
    // some batch event, so the batch's distinct buckets are exactly the
    // affected set — no fold needed for planning), and the series-wipe
    // pairs (tombstones are rare; collecting them here makes the wipe set
    // a driver-local relation instead of two broadcast-subquery re-scans
    // of the batch inside the merge plan).
    val isWipe = col("op") === "delete" && col("turn_idx").isNull && col("_error").isNull
    val lineage = MergeEngine.tagErrors(events, spec.deleteEnabled).groupBy("partition")
      .agg(
        max("offset").as("max_off"),
        count(lit(1)).as("n"),
        sum(when(col("_error").isNotNull, 1L).otherwise(0L)).as("bad"),
        collect_set(when(col("_error").isNull,
          MergeEngine.bucketOf(col("conv_id"), table.numBuckets))).as("buckets"),
        collect_list(when(isWipe, struct(col("conv_id"), col("offset")))).as("wipe_pairs"))
      .collect()
    val eventsSeen = lineage.map(_.getAs[Long]("n")).sum
    val rejectedCount = lineage.map(_.getAs[Long]("bad")).sum
    val touched = lineage.flatMap(_.getAs[scala.collection.Seq[Int]]("buckets")).toSet

    // series wipes: max tombstone offset per conversation (driver-side
    // reduce of the collected pairs; bounded by tombstone volume per batch)
    val wipeMap = lineage
      .flatMap(_.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("wipe_pairs"))
      .groupBy(_.getString(0))
      .map { case (c, rs) => (c, rs.map(_.getLong(1)).max) }
    val wipes = spark.createDataFrame(
      wipeMap.toSeq.map { case (c, o) => org.apache.spark.sql.Row(c, o) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("conv_id", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("wipe_off", org.apache.spark.sql.types.LongType))))

    // --- per-key fold (computed once, consumed lazily by the merge) ---
    val actions =
      if (spec.foldStrategy == "agg") MergeEngine.netActions(valid, wipes)
      else MergeEngine.netActionsViaJoin(valid, wipes)

    // Normalize action rows to the (possibly evolved) table schema:
    // missing columns → null, narrower types → up-cast.
    val rowFields = actions.schema("row").dataType.asInstanceOf[StructType].fieldNames.toSet
    val normRow = struct(evolved.fields.toSeq.map { f =>
      (f.name match {
        case "_partition" if spec.coordinates => col("src_partition").cast(f.dataType)
        case "_offset" if spec.coordinates    => col("src_offset").cast(f.dataType)
        case n if rowFields.contains(n)       => col(s"row.$n").cast(f.dataType)
        case _                                => lit(null).cast(f.dataType)
      }).as(f.name)
    }: _*)
    val normActions = actions.withColumn("row", normRow)

    if (touched.isEmpty) {
      // Nothing to merge (e.g. all events invalid) — still commit the
      // epoch marker so re-delivery stays a no-op.
      val snap = commitSnapshot(table, Map.empty, touched, evolved, epoch, lineage, 0L, eventsSeen, rejectedCount)
      return BatchResult(snap, skipped = false, 0L, eventsSeen, rejectedCount)
    }

    // --- copy-on-write merge of affected buckets ---
    val base = {
      val files = table.dataFiles(Some(touched))
      if (files.isEmpty)
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), evolved)
      else spark.read.schema(evolved).parquet(files: _*)
    }
    val merged = MergeEngine.merge(base, normActions, wipes)

    val stage = table.newStageDir()
    // Skew-aware write partitioning (MergeSpec.writeSalts): a hot
    // conversation (Zipf head) concentrates in one bucket; partitioning
    // the write by bucket alone would make that bucket a straggler task.
    // Default = AQE rebalance (hot partitions split, cold coalesce);
    // fixed salting available for extreme known skew. Files stay
    // bucket-pure via partitionBy, so pruning is unaffected. AQE handles
    // the join side; this handles the write side.
    val withBucket = merged.withColumn("bucket", MergeEngine.bucketOf(col("conv_id"), table.numBuckets))
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

    val snap = commitSnapshot(table, staged, touched, evolved, epoch, lineage, rowsWritten, eventsSeen, rejectedCount)
    BatchResult(snap, skipped = false, rowsWritten, eventsSeen, rejectedCount)
  }

  /** Sum of row counts from parquet footers (driver-side metadata reads). */
  private def footerRowCount(spark: SparkSession, paths: Iterable[String]): Long = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    paths.map { p =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(p), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getFooter.getBlocks.asScala.map(_.getRowCount.toLong).sum
      finally r.close()
    }.sum
  }

  private def lastEpoch(s: IceLite.Snapshot, streamId: String): Option[Long] =
    s.properties.get(s"epoch:$streamId").map(_.toLong)

  private def commitSnapshot(
      table: IceLiteTable,
      staged: Map[Int, Seq[String]],
      touched: Set[Int],
      evolved: StructType,
      epoch: Option[(String, Long)],
      lineage: Array[org.apache.spark.sql.Row],
      rowsWritten: Long,
      eventsSeen: Long,
      rejected: Long): IceLite.Snapshot =
    try {
      table.commit { parent =>
        epoch.foreach { case (sid, bid) =>
          if (lastEpoch(parent, sid).exists(_ >= bid)) throw AlreadyApplied(bid)
        }
        val newFiles = (parent.files -- touched.toSeq) ++
          staged ++
          // a touched bucket whose merge produced no rows becomes empty
          (touched -- staged.keySet).map(_ -> Seq.empty[String]).toMap
        val offsetProps = lineage.map { r =>
          val p = r.getAs[Int]("partition")
          val prev = parent.properties.get(s"maxoff:$p").map(_.toLong).getOrElse(Long.MinValue)
          s"maxoff:$p" -> math.max(prev, r.getAs[Long]("max_off")).toString
        }.toMap
        val epochProps = epoch.map { case (sid, bid) => s"epoch:$sid" -> bid.toString }.toMap
        parent.copy(
          schemaJson = evolved.json,
          files = newFiles.filter(_._2.nonEmpty),
          properties = parent.properties ++ offsetProps ++ epochProps,
          metrics = Map(
            "rowsWritten" -> rowsWritten,
            "bucketsRewritten" -> touched.size.toLong,
            "eventsApplied" -> eventsSeen,
            "rejected" -> rejected))
      }
    } catch {
      case AlreadyApplied(_) => table.current
    }
}
