package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.model.ChangeEvent

/** Streaming observability over the change-event stream — the engine-side
  * analogue of the reference connector's JMX/commit metrics surface
  * (records-written counts per put, `/root/reference/src/main/java/io/confluent/connect/jdbc/sink/BufferedRecords.java:262-273`)
  * expressed with the native Structured Streaming primitives:
  *
  *  - [[opCounts]]: event-time windowed aggregation WITH a watermark, so
  *    state for closed windows is dropped (bounded state at 10^10-event
  *    scale; late events beyond the watermark are discarded, matching the
  *    at-most-this-late contract a monitoring stream wants);
  *  - [[conversationProgress]]: arbitrary per-key state via
  *    `mapGroupsWithState` — a running per-conversation session tracker
  *    (turn count, max offset, last activity) that survives across
  *    micro-batches and expires idle conversations by processing-time
  *    timeout (GDPR-friendly: state does not outlive activity).
  *
  * Both run against the same envelope the ingest stream reads, as a
  * SECOND independent streaming query — metrics never sit in the commit
  * path (the exactly-once epoch pipeline stays the only writer).
  */
object StreamMetrics {

  /** Per-(window, op) event counts + max offset, watermarked on event time.
    * Output mode `update`/`append` both work; state is bounded by the
    * watermark horizon regardless of stream length.
    */
  def opCounts(
      events: DataFrame,
      windowLen: String = "1 minute",
      watermarkDelay: String = "2 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen), col("op"))
      .agg(count(lit(1)).as("n"), max("offset").as("max_offset"))

  /** Running state of one conversation, maintained across micro-batches. */
  final case class ConvProgress(
      conv_id: String,
      turns_seen: Long,
      deletes_seen: Long,
      max_offset: Long,
      last_ts: Timestamp)

  /** Fold each micro-batch's events into per-conversation running state
    * with `mapGroupsWithState` (processing-time timeout expires idle
    * conversations so total state tracks the ACTIVE key set, not the
    * lifetime key set).
    */
  def conversationProgress(
      events: Dataset[ChangeEvent],
      idleTimeout: String = "30 minutes"): Dataset[ConvProgress] = {
    val spark = events.sparkSession
    import spark.implicits._
    implicit val enc = Encoders.product[ConvProgress]
    events
      .groupByKey(_.conv_id)
      .mapGroupsWithState(GroupStateTimeout.ProcessingTimeTimeout())(
        updateConversation(idleTimeout))
  }

  /** The per-group state transition — public so it unit-tests with
    * `org.apache.spark.sql.streaming.TestGroupState` (the documented
    * harness for GroupState functions; no streaming query needed).
    */
  def updateConversation(idleTimeout: String = "30 minutes")(
      convId: String,
      batch: Iterator[ChangeEvent],
      state: GroupState[ConvProgress]): ConvProgress = {
    if (state.hasTimedOut) {
      val last = state.get
      state.remove()
      return last
    }
    var cur = state.getOption.getOrElse(ConvProgress(convId, 0L, 0L, Long.MinValue, new Timestamp(0L)))
    batch.foreach { e =>
      cur = ConvProgress(
        convId,
        cur.turns_seen + (if (e.op != "delete") 1L else 0L),
        cur.deletes_seen + (if (e.op == "delete") 1L else 0L),
        math.max(cur.max_offset, e.offset),
        if (e.ts.after(cur.last_ts)) e.ts else cur.last_ts)
    }
    state.update(cur)
    state.setTimeoutDuration(idleTimeout)
    cur
  }
}
