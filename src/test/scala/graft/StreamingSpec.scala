package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.gen.ChangeLogGen
import graft.model.ChangeEvent
import graft.streaming.CdcStream
import graft.table.IceLite

class StreamingSpec extends SparkSuite {
  import TestHelpers._

  private def collectLog(df: org.apache.spark.sql.DataFrame): Seq[ChangeEvent] = {
    import spark.implicits._
    df.withColumnRenamed("schema_v", "schemaV").drop("chunk").as[ChangeEvent].collect().toSeq
  }

  private def stateTriples(t: graft.table.IceLiteTable) =
    readTable(spark, t).map(x => (x.conv_id, x.turn_idx, x.text))

  private def oracleTriples(evs: Seq[ChangeEvent]) =
    OracleFold.rows(OracleFold.finalState(evs)).map(x => (x.conv_id, x.turn_idx, x.text))

  test("streamed replay over file source equals oracle, multiple epochs") {
    val root = tmpDir("stream-basic")
    val cfg = ChangeLogGen.GenConfig(numEvents = 5000, numConvs = 60, maxTurns = 10, logPartitions = 4)
    ChangeLogGen.writeLog(spark, cfg, s"$root/log", chunks = 3)

    val sc = CdcStream.StreamConfig(s"$root/log", s"$root/table", s"$root/ckpt",
      maxFilesPerTrigger = Some(1))
    val table = CdcStream.runAvailable(spark, sc)

    assert(table.current.properties("epoch:cdc").toLong >= 2, "expected multiple epochs")
    val evs = collectLog(spark.read.parquet(s"$root/log"))
    assert(stateTriples(table) == oracleTriples(evs))
  }

  test("resume from checkpoint: new log files processed, old ones not re-read") {
    val root = tmpDir("stream-resume")
    val cfg = ChangeLogGen.GenConfig(numEvents = 2000, numConvs = 30, maxTurns = 8, logPartitions = 2)
    ChangeLogGen.writeLog(spark, cfg, s"$root/log", chunks = 2)
    val sc = CdcStream.StreamConfig(s"$root/log", s"$root/table", s"$root/ckpt")
    val t1 = CdcStream.runAvailable(spark, sc)
    val v1 = t1.currentVersion

    // append a late chunk with fresh, higher offsets
    val extra = Seq(
      ins(5000000L, "c_late", 0, "late-insert"),
      del(5000001L, "c00000001", None)) // wipe an existing conversation
    eventsDF(spark, extra)
      .withColumn("schema_v", lit(2)).drop("schemaV")
      .write.mode("append").parquet(s"$root/log/chunk=9")

    val t2 = CdcStream.runAvailable(spark, sc)
    assert(t2.currentVersion > v1)

    val evs = collectLog(spark.read.parquet(s"$root/log"))
    assert(stateTriples(t2) == oracleTriples(evs))
    assert(stateTriples(t2).exists(_._1 == "c_late"))
    assert(!stateTriples(t2).exists(_._1 == "c00000001"))
  }

  test("crash after table commit but before checkpoint commit: epoch re-run is skipped") {
    val root = tmpDir("stream-crash")
    val cfg = ChangeLogGen.GenConfig(numEvents = 1500, numConvs = 20, maxTurns = 6, logPartitions = 2)
    ChangeLogGen.writeLog(spark, cfg, s"$root/log", chunks = 2)
    val sc = CdcStream.StreamConfig(s"$root/log", s"$root/table", s"$root/ckpt")
    val t1 = CdcStream.runAvailable(spark, sc)
    val lastEpoch = t1.current.properties("epoch:cdc").toLong
    val vDone = t1.currentVersion
    val stateBefore = stateTriples(t1)

    // fault injection: drop the streaming commit marker for the last epoch
    // — Spark will believe the batch never finished and re-run it with the
    // same batch id and file set on restart.
    val marker = Paths.get(s"$root/ckpt/commits/$lastEpoch")
    assert(Files.exists(marker), s"no commit marker at $marker")
    Files.delete(marker)
    Files.deleteIfExists(Paths.get(s"$root/ckpt/commits/.$lastEpoch.crc"))

    val t2 = CdcStream.runAvailable(spark, sc)
    assert(t2.current.properties("epoch:cdc").toLong == lastEpoch)
    assert(t2.currentVersion == vDone, "re-run epoch must be a no-op commit-wise")
    assert(stateTriples(t2) == stateBefore)
  }
}
