package graft

import org.apache.spark.sql.functions._

import graft.model.Schemas
import graft.operators.EventLogApply
import graft.table.IceLite

/** Append-only event-log table (reference INSERT mode) + IceLite
  * maintenance (compaction, snapshot expiry).
  */
class EventLogSpec extends SparkSuite {
  import TestHelpers._

  test("append mode: every event becomes a row with lineage; epoch idempotent") {
    val dir = tmpDir("eventlog") + "/t"
    val t = IceLite.create(dir, EventLogApply.logSchema(Schemas.transcript), 8)
    val b1 = Seq(ins(0, "c1", 0, "v0"), ups(1, "c1", 0, "v1"), del(2, "c1", Some(0)))
    val b2 = Seq(ins(3, "c2", 1, "x"))
    val r1 = EventLogApply.appendBatch(spark, t, eventsDF(spark, b1), epoch = Some(("q", 0L)))
    val r2 = EventLogApply.appendBatch(spark, t, eventsDF(spark, b2), epoch = Some(("q", 1L)))
    assert(r1.rowsWritten == 3 && r2.rowsWritten == 1)

    // all 4 events present, append-only, with coordinates
    val rows = t.read(spark).orderBy("_offset").collect()
    assert(rows.length == 4)
    assert(rows.map(_.getAs[String]("op")).toSeq == Seq("insert", "upsert", "delete", "insert"))
    assert(rows.map(_.getAs[Long]("_offset")).toSeq == Seq(0L, 1L, 2L, 3L))

    // duplicate epoch delivery is a no-op
    val r3 = EventLogApply.appendBatch(spark, t, eventsDF(spark, b2), epoch = Some(("q", 1L)))
    assert(r3.skipped && t.read(spark).count() == 4)
  }

  test("compaction merges fragmented buckets, content unchanged") {
    val dir = tmpDir("compact") + "/t"
    val t = IceLite.create(dir, EventLogApply.logSchema(Schemas.transcript), 2)
    (0 until 6).foreach { i =>
      EventLogApply.appendBatch(spark, t,
        eventsDF(spark, Seq(ins(i.toLong, s"c$i", 0, s"v$i"))), epoch = Some(("q", i.toLong)))
    }
    val before = t.read(spark).orderBy("_offset").collect().map(_.toString).toSeq
    val fragmented = t.current.files.count(_._2.size > 1)
    assert(fragmented > 0, "expected fragmented buckets")
    val n = t.compact(spark, maxFilesPerBucket = 1)
    assert(n == fragmented)
    assert(t.current.files.forall(_._2.size == 1))
    val after = t.read(spark).orderBy("_offset").collect().map(_.toString).toSeq
    assert(after == before)
  }

  test("expireSnapshots deletes old snapshots and orphaned data files only") {
    val dir = tmpDir("expire") + "/t"
    val t = IceLite.create(dir, TestHelpers.turnSchema, 4)
    // cow: each batch rewrites the bucket, orphaning the previous files —
    // the expiry behavior under test (mor snapshots reference deltas
    // cumulatively, so nothing orphans until compaction)
    (0 until 4).foreach { i =>
      graft.operators.CdcApply.applyBatch(spark, t,
        eventsDF(spark, Seq(ins(i.toLong, "c1", i, s"v$i"))), epoch = Some(("q", i.toLong)),
        spec = graft.model.MergeSpec(mergeStrategy = "cow"))
    }
    val rowsBefore = readTable(spark, t)
    val vBefore = t.currentVersion
    val (snapsDropped, filesDropped) = t.expireSnapshots(keepLast = 1)
    assert(snapsDropped == vBefore.toInt - 1)
    assert(filesDropped > 0)
    assert(t.currentVersion == vBefore)
    assert(readTable(spark, t) == rowsBefore) // surviving snapshot intact
    // all referenced files still exist
    t.dataFiles().foreach(p => assert(java.nio.file.Files.exists(java.nio.file.Paths.get(p)), p))
  }
}
