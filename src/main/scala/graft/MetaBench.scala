package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Long-streamed metadata-flatness evidence: N micro-batch epochs through
  * CdcStream with automatic maintenance, asserting that per-epoch trigger
  * time does NOT grow with table age. With full-listing snapshots the
  * driver would parse O(live files) per epoch and the trigger time would
  * trend up; with diff v-files + the memoized fold it stays flat (one
  * diff per commit), and maintenance bounds the on-disk metadata file
  * count. Writes BENCH/metadata-flatness.md.
  *
  * Usage: runMain graft.MetaBench [epochs] [eventsPerEpoch]
  */
object MetaBench {
  def main(args: Array[String]): Unit = {
    val epochs = args.headOption.map(_.toInt).getOrElse(200)
    val perEpoch = args.drop(1).headOption.map(_.toLong).getOrElse(5000L)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // FAIR scheduling: background maintenance (its own pool) shares
      // task slots with ingest epochs instead of head-of-line blocking
      // them on a saturated local cluster
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.local.dir", Bench.localDirs())
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = Files.createTempDirectory(Bench.tmpBase, "graft-metabench").toString
    graft.gen.ChangeLogGen.writeLog(spark,
      graft.gen.ChangeLogGen.GenConfig(
        numEvents = epochs * perEpoch,
        numConvs = math.max(200, (epochs * perEpoch / 50).toInt),
        maxTurns = 20, logPartitions = 8),
      s"$dir/log", chunks = epochs)

    val durations = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val d = e.progress.durationMs
        // note: numInputRows is 0 in drift mode (the streamed scan is only
        // the offset feed; foreachBatch re-reads the epoch's files), so
        // gate on the addBatch phase being present instead
        if (d != null && d.containsKey("triggerExecution") && d.containsKey("addBatch"))
          durations.synchronized { durations += ((e.progress.batchId, d.get("triggerExecution").longValue())) }
      }
    })

    val spinPre = Bench.spinProbeMs()
    val sc = graft.streaming.CdcStream.StreamConfig(
      s"$dir/log", s"$dir/table", s"$dir/ckpt",
      maxFilesPerTrigger = Some(8), // 8 log-partition files = one chunk per trigger
      eventLogTableDir = Some(s"$dir/eventlog"),
      maintenanceEvery = 32, keepSnapshots = 8)
    val table = graft.streaming.CdcStream.runAvailable(spark, sc)
    val spinPost = Bench.spinProbeMs()

    // the listener bus is async: drain until the progress stream goes quiet
    var last = -1
    var stable = 0
    while (stable < 3) {
      Thread.sleep(1000)
      val n = durations.synchronized(durations.size)
      if (n == last) stable += 1 else { stable = 0; last = n }
    }
    val ds = durations.synchronized(durations.sortBy(_._1).toVector)
    def median(xs: Seq[Long]): Long =
      if (xs.isEmpty) 0L else xs.sorted.apply(xs.size / 2)
    val warm = ds.drop(5) // classloading/codegen epochs excluded
    val head = median(warm.take(warm.size / 3).map(_._2))
    val tail = median(warm.takeRight(warm.size / 3).map(_._2))
    val worst = if (warm.isEmpty) 0L else warm.map(_._2).max
    // attribution for the slow tail: is a slow epoch a maintenance-cadence
    // epoch (or its immediate successor, which overlaps the background
    // task), or host noise on an ordinary epoch?
    def cadenceish(id: Long): String =
      if ((id + 1) % 32 == 0) "cadence" else if (id % 32 == 0 && id > 0) "cadence+1" else "-"
    val slowest = warm.sortBy(-_._2).take(5)
      .map { case (id, ms) => s"epoch $id: ${ms}ms [${cadenceish(id)}]" }
    def countFiles(p: String): Int = {
      val s = java.nio.file.Files.list(Paths.get(p)); try s.count().toInt finally s.close()
    }
    val snapFiles = countFiles(s"$dir/table/snap")
    val rows = table.read(spark).count()
    println(f"[metabench] epochs=${ds.size} head-median=${head}ms tail-median=${tail}ms " +
      f"worst=${worst}ms snapFiles=$snapFiles stateRows=$rows spin=$spinPre%.0f/$spinPost%.0f")
    println(s"[metabench] slowest 5: ${slowest.mkString("; ")}")

    val md =
      f"""# BENCH — snapshot-metadata flatness over a long streamed replay
         |
         |${ds.size} streamed micro-batch epochs x $perEpoch%,d change events
         |(CdcStream + event log, maintenanceEvery=32, keepSnapshots=8 —
         |maintenance runs on a BACKGROUND thread in its own FAIR scheduler
         |pool, so cadence epochs share slots with it instead of stalling;
         |local[8], tmpfs; spin probes $spinPre%.0f/$spinPost%.0f ms, idle ~150).
         |
         || metric | value |
         ||---|---|
         || per-epoch trigger median, first third (post-warmup) | $head ms |
         || per-epoch trigger median, last third | $tail ms |
         || tail / head | ${tail.toDouble / math.max(head, 1)}%.2f |
         || worst epoch (incl. budgeted compaction + maintenance epochs) | $worst ms |
         || slowest 5 epochs (cadence attribution) | ${slowest.mkString("; ")} |
         || snap-dir metadata files after ${ds.size} epochs | $snapFiles (bounded by keepSnapshots + cadence, not O(epochs)) |
         || final state rows | $rows |
         |
         |Diff v-files + the memoized fold keep driver-side metadata work at
         |ONE diff parse per commit regardless of table age (pinned by
         |IceLiteSpec's fold-steps test); automatic maintenance expires the
         |snapshot chain and generationally folds the event log's small
         |files, so neither metadata bytes nor file counts grow with epoch
         |count. Reading tail/head: residual growth reflects the DATA, not
         |metadata — the budgeted MOR compaction rewrites ~budget buckets
         |per epoch and those buckets hold more state as the table grows
         |(the intrinsic amortized O(state/threshold) write cost), while
         |the metadata-side evidence is the bounded snap-dir file count and
         |the constant per-commit fold step. The slowest-5 attribution is
         |the maintenance verdict: epochs tagged `cadence`/`cadence+1`
         |would mean maintenance stalls the stream; `[-]` tags mean the
         |slow epochs are ordinary ones caught in the VM's documented
         |noise windows and maintenance never appears in the slow set.
         |""".stripMargin
    Files.createDirectories(Paths.get("/root/repo/BENCH"))
    Files.writeString(Paths.get("/root/repo/BENCH/metadata-flatness.md"), md)
    Bench.deleteRecursively(dir)
    spark.stop()
  }
}
