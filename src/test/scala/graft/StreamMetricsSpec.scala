package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.model.ChangeEvent
import graft.streaming.StreamMetrics

/** Watermarked windowed aggregation + mapGroupsWithState session state
  * over the change stream (the native Structured Streaming primitives the
  * engine uses for monitoring alongside the exactly-once ingest query).
  */
class StreamMetricsSpec extends SparkSuite {
  import TestHelpers._

  test("opCounts: event-time windows with watermark, counts per op") {
    val sp = spark
    implicit val sq = sp.sqlContext
    import sp.implicits._
    val in = MemoryStream[ChangeEvent]
    val q = StreamMetrics.opCounts(in.toDF(), windowLen = "1 minute", watermarkDelay = "2 minutes")
      .writeStream.format("memory").queryName("op_counts").outputMode("update").start()
    try {
      // ts(off) = 1700000000000 + off*1000 — offsets 0..59 land in one minute
      in.addData(ins(0L, "c1", 0, "a"), ins(1L, "c1", 1, "b"), del(2L, "c1", Some(0)))
      q.processAllAvailable()
      val rows = spark.table("op_counts")
        .select(col("op"), col("n"), col("max_offset")).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(rows == Map("insert" -> ((2L, 1L)), "delete" -> ((1L, 2L))))

      // a second batch in the same window updates the running counts
      in.addData(ins(3L, "c2", 0, "c"))
      q.processAllAvailable()
      val n2 = spark.table("op_counts").filter(col("op") === "insert")
        .agg(max("n")).collect()(0).getLong(0)
      assert(n2 == 3L)
    } finally q.stop()
  }

  test("conversationProgress: state transition carries across batches (TestGroupState harness)") {
    import org.apache.spark.sql.streaming.TestGroupState
    import graft.streaming.StreamMetrics.ConvProgress

    // batch 1: two inserts for c1
    val s1 = TestGroupState.create[ConvProgress](
      optionalState = org.apache.spark.api.java.Optional.empty[ConvProgress](), timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout(),
      batchProcessingTimeMs = 1000L, eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)
    val r1 = StreamMetrics.updateConversation()("c1",
      Iterator(ins(0L, "c1", 0, "a"), ins(1L, "c1", 1, "b")), s1)
    assert((r1.turns_seen, r1.deletes_seen, r1.max_offset) == ((2L, 0L, 1L)))
    assert(s1.get == r1)

    // batch 2: a delete arrives — prior state must carry forward
    val s2 = TestGroupState.create[ConvProgress](
      optionalState = org.apache.spark.api.java.Optional.of(s1.get), timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout(),
      batchProcessingTimeMs = 2000L, eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)
    val r2 = StreamMetrics.updateConversation()("c1", Iterator(del(2L, "c1", Some(1))), s2)
    assert((r2.turns_seen, r2.deletes_seen, r2.max_offset) == ((2L, 1L, 2L)))

    // idle timeout: state is emitted one last time and removed
    val s3 = TestGroupState.create[ConvProgress](
      optionalState = org.apache.spark.api.java.Optional.of(s2.get), timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout(),
      batchProcessingTimeMs = 3000L, eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = true)
    val r3 = StreamMetrics.updateConversation()("c1", Iterator.empty, s3)
    assert(r3 == r2)
    assert(s3.isRemoved)
  }
}
