package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.model.{MergeSpec, Schemas}
import graft.operators.CdcApply
import graft.table.{IceLite, IceLiteTable}

/** Structured Streaming driver: tails the change-event log (a parquet
  * file-source directory standing in for Kafka — no kafka jar in this
  * sandbox) and applies each micro-batch through CdcApply inside
  * foreachBatch.
  *
  * Exactly-once = Spark's checkpointed offset log (which files each epoch
  * covers) + the idempotent epoch commit in the IceLite snapshot
  * (`epoch:<streamId>` property): after a crash, Spark re-runs the last
  * possibly-uncommitted epoch with the SAME batch id and file set, and
  * CdcApply either re-applies it deterministically (snapshot was never
  * committed) or skips it (it was) — the engine-side analogue of the
  * reference's one-JDBC-transaction-per-put
  * (`/root/reference/src/main/java/io/confluent/connect/jdbc/sink/JdbcDbWriter.java:56,83`)
  * on top of Connect's at-least-once redelivery
  * (`.../sink/JdbcSinkTask.java:102-107`).
  */
object CdcStream {

  final case class StreamConfig(
      logDir: String,
      tableDir: String,
      checkpointDir: String,
      streamId: String = "cdc",
      spec: MergeSpec = MergeSpec(),
      maxFilesPerTrigger: Option[Int] = None,
      rejectedDir: Option[String] = None,
      availableNow: Boolean = true,
      /** when set, every event is also APPENDED to this IceLite table —
        * the reference's INSERT-mode event log, kept alongside the
        * latest-state view (north star: "append-only event log plus
        * latest-state upsert view") */
      eventLogTableDir: Option[String] = None)

  /** Start (or resume, given the same checkpointDir) the ingest stream.
    * Creates the table on first use with the log's after-struct schema.
    */
  def start(spark: SparkSession, cfg: StreamConfig): StreamingQuery = {
    val table: IceLiteTable =
      if (IceLite.exists(cfg.tableDir)) IceLite.load(cfg.tableDir)
      else IceLite.create(cfg.tableDir, Schemas.transcript, cfg.spec.numBuckets)
    val logTable: Option[IceLiteTable] = cfg.eventLogTableDir.map { d =>
      if (IceLite.exists(d)) IceLite.load(d)
      else IceLite.create(d, graft.operators.EventLogApply.logSchema(Schemas.transcript), cfg.spec.numBuckets)
    }

    var reader = spark.readStream.schema(Schemas.envelope())
    cfg.maxFilesPerTrigger.foreach(n => reader = reader.option("maxFilesPerTrigger", n))
    val events = reader.parquet(cfg.logDir)

    val writer = events.writeStream
      .queryName(s"graft-${cfg.streamId}")
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch { (df: DataFrame, epochId: Long) =>
        val batch = df.drop("chunk")
        // The event-log append and the state merge are independent jobs
        // against different tables — submit the append concurrently so it
        // overlaps the merge's driver-side planning/commit (the Amdahl
        // serial region) instead of serializing in front of it. Each
        // commits its own epoch marker, so a crash between the two is
        // still exactly-once per table on re-delivery.
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        import scala.concurrent.ExecutionContext.Implicits.global
        val logAppend = logTable.map { lt =>
          Future {
            graft.operators.EventLogApply.appendBatch(
              spark, lt, batch, cfg.spec, epoch = Some((cfg.streamId, epochId)))
          }
        }
        CdcApply.applyBatch(
          spark, table, batch, cfg.spec,
          epoch = Some((cfg.streamId, epochId)),
          rejectedDir = cfg.rejectedDir)
        logAppend.foreach(Await.result(_, Duration.Inf))
        ()
      }
    (if (cfg.availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** Run to completion over the currently-available log and return the table. */
  def runAvailable(spark: SparkSession, cfg: StreamConfig): IceLiteTable = {
    val q = start(spark, cfg.copy(availableNow = true))
    q.awaitTermination()
    IceLite.load(cfg.tableDir)
  }
}
