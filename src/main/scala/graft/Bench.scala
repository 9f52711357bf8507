package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Driver-run benchmark: times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR plus the engine's headline CDC replay, and prints
  * ONE JSON line. The cdc replay is the north-star metric
  * (change-events/sec); scaling evidence across parallelism levels is
  * produced by graft.ScalingBench (see BENCH/BASELINE.md).
  *
  * Self-diagnosing protocol (round-4): the CDC write path gets its own
  * untimed warmup replay (codegen/JIT for the fold+write otherwise lands
  * entirely on timed batch 0 — measured 4-6x the steady epoch), the
  * replay phase is bracketed by its own spin probes (whole-run probes
  * missed mid-run contention twice), and per-epoch walls plus a
  * steady-state metric (`cdc_replay_steady`, best non-first epoch) are
  * emitted so one noisy epoch cannot silently halve the headline.
  */
object Bench {

  /** RAM-backed scratch base for bench I/O (on a real cluster, store
    * bandwidth scales with executors; a single local disk does not and
    * would measure the disk, not the engine).
    */
  def tmpBase: java.nio.file.Path = {
    val p = java.nio.file.Paths.get(sys.env.getOrElse("GRAFT_BENCH_TMP", "/dev/shm"))
    if (java.nio.file.Files.isDirectory(p)) p
    else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
  }

  /** Spark local (shuffle/spill) scratch on the RAM-backed base — see
    * [[tmpBase]]; a real cluster's shuffle bandwidth scales with its
    * executors' local disks, the sandbox's single /tmp disk does not.
    */
  def localDirs(): String = {
    val p = tmpBase.resolve("graft-spark-local")
    java.nio.file.Files.createDirectories(p)
    p.toString
  }

  /** The ONE bench session config, shared verbatim by Bench and
    * ScalingBench so the replay measured here reproduces there (config
    * parity was a round-3 finding: a session knob added for the content
    * queries silently diverged the two).
    */
  def session(cores: Int, appName: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      // 3 tasks per core per stage (not the 200 default): stage tails stop
      // dominating; matches multi-executor sizing practice
      .config("spark.sql.shuffle.partitions", (cores * 3).toString)
      .config("spark.sql.adaptive.enabled", "true")
      // CPU-heavy-per-byte stages (lambda shingling/grams in q19/q21/q25)
      // get coalesced to ONE task by AQE's default 1MB min partition size
      // at small SF — the bytes are tiny, the per-byte CPU is not (q21
      // measured 7.3s -> 3.9s). At real shuffle sizes total/parallelism
      // >> 64k, so the lower floor changes nothing at scale (A/B-able on
      // the replay via GRAFT_MIN_PART; see BENCH/BASELINE.md).
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("GRAFT_MIN_PART", "64k"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", localDirs())
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def deleteRecursively(dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(root)) {
      val w = java.nio.file.Files.walk(root)
      try w.iterator.asScala.toSeq.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
      finally w.close()
    }
  }

  /** Run the CDC replay (generate log, apply per-batch through the full
    * validate→fold→MOR-write→commit path) and return the per-batch wall
    * times in seconds. Log generation is untimed (Kafka stand-in).
    */
  def replay(spark: SparkSession, numEvents: Long, numBatches: Int, buckets: Int, logDir: String,
             spec: graft.model.MergeSpec = null): Seq[Double] = {
    import graft.gen.ChangeLogGen
    import graft.operators.CdcApply
    import graft.table.IceLite

    val cfg = ChangeLogGen.GenConfig(
      numEvents = numEvents, numConvs = math.max(100, (numEvents / 100).toInt),
      maxTurns = 50, logPartitions = 96)
    // stage the log to parquet (not timed — Kafka stand-in)
    ChangeLogGen.writeLog(spark, cfg, logDir, chunks = numBatches)
    val log = spark.read.parquet(logDir)
    val schema = graft.model.Schemas.transcript
    val dir = java.nio.file.Files.createTempDirectory(tmpBase, "graft-bench-table").toString
    val table = IceLite.create(s"$dir/t", schema, buckets)

    // Per-batch task-time accounting: separates "the engine did more
    // work" (taskSum/cpu grow) from "the machine was slow" (wall grows,
    // taskSum flat -> idle executors; taskSum grows but cpu flat ->
    // tasks stalled on memory/steal). The sandbox VM's noise windows
    // are otherwise indistinguishable from regressions.
    val agg = new java.util.concurrent.atomic.AtomicReference((0L, 0L, 0L)) // runMs, cpuNs, gcMs
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        agg.updateAndGet { case (r, c, g) =>
          (r + m.executorRunTime, c + m.executorCpuTime, g + m.jvmGCTime)
        }
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val walls = try {
      (0 until numBatches).map { b =>
        val before = agg.get()
        val tb = System.nanoTime()
        // GRAFT_FOLD_ALIGN=bucket A/Bs the single-exchange fold plan
        // back-to-back in the same host window (the only reliable
        // comparison method on this VM — see BENCH/BASELINE.md)
        CdcApply.applyBatch(spark, table, log.filter(col("chunk") === b).drop("chunk"),
          spec = if (spec == null) graft.model.MergeSpec(numBuckets = buckets,
            foldAlignment = sys.env.getOrElse("GRAFT_FOLD_ALIGN",
              graft.model.MergeSpec().foldAlignment)) else spec,
          epoch = Some(("bench", b.toLong)))
        val w = (System.nanoTime() - tb) / 1e9
        Thread.sleep(300) // listener bus drain (diagnostic only, untimed)
        val after = agg.get()
        val (runS, cpuS, gcS) =
          ((after._1 - before._1) / 1e3, (after._2 - before._2) / 1e9, (after._3 - before._3) / 1e3)
        System.err.println(f"[bench] batch $b: $w%.2fs " +
          f"(taskSum=$runS%.1fs cpu=$cpuS%.1fs gc=$gcS%.1fs avgConc=${runS / math.max(w, 0.01)}%.1f)")
        w
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    deleteRecursively(dir) // RAM-backed scratch — free it
    walls
  }

  /** Machine-contention probe: one fixed single-threaded spin loop
    * (~150 ms on an idle core of this VM). Run around each bench phase
    * and emitted in the JSON: if a reading is far above the idle
    * calibration, that phase was contended and its timings should be
    * read accordingly — the noise is self-evident from the output alone.
    */
  def spinProbeMs(): Double = {
    var x = 0L
    var i = 0L
    val n = 300000000L
    val t0 = System.nanoTime()
    while (i < n) { x ^= i * 2654435761L; i += 1 }
    val ms = (System.nanoTime() - t0) / 1e6
    if (x == 42L) System.err.println("") // defeat dead-code elimination
    ms
  }

  /** Memory-bandwidth probe (single-thread triad over 2x128MB, GB/s).
    * The CPU spin probe misses the noise that actually moves this
    * workload: neighbor VMs saturating the socket's memory bandwidth
    * showed clean ~160ms spins while replay walls swung 3x. Idle
    * calibration on this VM: ~10-11 GB/s (matches the 1-thread
    * STREAM-triad in BENCH/BASELINE.md); readings far below that mean
    * the bandwidth was contended during the bracketed phase.
    */
  def memProbeGBs(): Double = {
    // allocated per call (first pass pays the page faults; best-of-3
    // discards it): object-pinned arrays would hold 256 MB of the fixed
    // driver heap through every measured phase for a millisecond probe
    val a = new Array[Long](16 << 20) // 128 MB
    val b = new Array[Long](16 << 20)
    var best = 0.0
    var pass = 0
    while (pass < 3) {
      val t0 = System.nanoTime()
      var i = 0
      while (i < a.length) { a(i) = b(i) * 3 + a(i); i += 1 }
      val s = (System.nanoTime() - t0) / 1e9
      val gbs = (3.0 * 8 * a.length) / s / 1e9 // 2 reads + 1 write per element
      if (gbs > best) best = gbs
      pass += 1
    }
    if (a(12345) == Long.MinValue) System.err.println("") // keep the writes live
    best
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = session(cpus.toInt, "graft-bench")

    // JVM/codegen warmup, untimed: the first query otherwise carries all
    // classloading + whole-stage-codegen compilation cost (measured ~3x
    // its steady-state time) — that is JVM startup, not the query's plan.
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet").limit(64).count()
      SparkEntry.queries.get("q02_filter_project").foreach(_(spark, sfDir).count())
      // operator-shape warmup for the dedup pipeline (round 5): the
      // exact-dup pre-pass + band-cap build added window/union/multi-join/
      // cache-build stages whose FIRST-TIME Catalyst analysis + codegen
      // measured 3-4s — JVM startup, not plan cost (same rationale as the
      // CDC-path warmup below). A 200-doc synthetic corpus on a temp dir
      // warms those code paths; its memo entries are evicted before the
      // measured phase so q19 still times the real sfDir BUILD.
      val wd = java.nio.file.Files.createTempDirectory(tmpBase, "graft-bench-warmdocs").toString
      // finally, not fall-through: a failed warmup count() must still
      // evict the warm corpus' memo caches and temp parquet, or the 38
      // measured queries run with persisted warm-doc blocks pinned in
      // executor storage memory and the scratch dir still on tmpfs.
      try {
        import spark.implicits._
        (0 until 200).map(i =>
          (i.toLong, s"warm doc $i where the table scan merge filter join query runs $i times", "en", "w", 60L))
          .toDF("doc_id", "text", "lang", "source", "n_chars")
          .write.mode("overwrite").parquet(s"$wd/documents.parquet")
        SparkEntry.queries.get("q19_dedup_minhash_lsh").foreach(_(spark, wd).count())
        SparkEntry.queries.get("q21_dedup_ngram_jaccard").foreach(_(spark, wd).count())
      } finally {
        graft.queries.ContentQueries.clearShared(spark)
        deleteRecursively(wd)
      }
    } catch { case _: Throwable => () }

    val spinPre = spinProbeMs()
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val failed = scala.collection.mutable.ListBuffer[String]()
    // focused timing: SPARK_GRAFT_BENCH_ONLY=q19,q33 runs just those
    // queries (prefix match); SPARK_GRAFT_BENCH_EVENTS=0 skips the replay
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").map(_.trim).toSet)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
      .foreach { case (name, fn) =>
      // best-of-2 per query: a single contended host window otherwise
      // masquerades as a query regression (measured 4x on q01 in one
      // driver-protocol run whose replay phase was clean). EXCEPT for
      // queries that build the session-memoized dedup pipeline (q19,
      // q44): their second sample would read the persisted result, and
      // min() would report cache-read time as the build cost — those
      // keep their first (building) sample.
      // KNOWN BIAS (documented, accepted): the first sample also warms
      // parquet footer caches and the OS page cache, so min() skews
      // toward warm-cache times relative to the pre-round-4
      // single-sample protocol — round-over-round comparisons against
      // r03-and-earlier BENCH history partly reflect that protocol
      // change, not engine speedups. Comparisons within the best-of-2
      // era (r04+) are like-for-like.
      try {
        val memoBefore = graft.queries.ContentQueries.sharedCount(spark)
        val first = {
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        val builtMemo = graft.queries.ContentQueries.sharedCount(spark) > memoBefore
        results(name) =
          if (builtMemo) first
          else {
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            math.min(first, (System.nanoTime() - t0) / 1e9)
          }
      }
      catch { case e: Throwable =>
        // a crashed query must not masquerade as a fast one
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        failed += name
        results(name) = -1.0
      }
    }
    val spinPostQueries = spinProbeMs()

    // headline: CDC replay throughput. Config (24M events, 2 epochs,
    // 128 buckets) is IDENTICAL to graft.ScalingBench (same session
    // builder, same replay helper) so the number quoted in
    // BENCH/BASELINE.md reproduces here within run-to-run noise.
    // North-rule-scale batches: per-batch fixed cost (~2-4s driver/
    // planning) amortizes — small batches measure scheduler overhead,
    // not the engine (see BENCH/BASELINE.md).
    val nEvents = sys.env.getOrElse("SPARK_GRAFT_BENCH_EVENTS", "24000000").toLong
    var replayWalls: Seq[Double] = Seq.empty
    val (evps, steady, evpsSteady, spinReplayPre, spinReplayPost, memReplayPre, memReplayPost) =
      if (nEvents <= 0) (0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
      else {
        // Release query-phase state so the replay measures the engine,
        // not the query phase's leftovers: memoized dedup-pipeline blocks,
        // cached relations, and — via GC → ContextCleaner — the 38
        // queries' shuffle files and broadcasts, which sit on the tmpfs
        // local dir (i.e. in RAM on this sandbox) until reclaimed.
        graft.queries.ContentQueries.clearShared(spark)
        spark.catalog.clearCache()
        (1 to 3).foreach { _ => System.gc(); Thread.sleep(500) }

        // CDC-path warmup, untimed (mirrors ScalingBench): the fold/write/
        // commit codegen+JIT otherwise lands on timed batch 0 — measured
        // 4-6x the warm epoch across three rounds of driver runs.
        val warmDir = java.nio.file.Files.createTempDirectory(tmpBase, "graft-bench-warm").toString
        replay(spark, 1000000L, numBatches = 2, buckets = 128, logDir = warmDir)
        deleteRecursively(warmDir)

        val logDir = java.nio.file.Files.createTempDirectory(tmpBase, "graft-bench-log").toString
        val sPre = spinProbeMs()
        val mPre = memProbeGBs()
        val walls = replay(spark, nEvents, numBatches = 2, buckets = 128, logDir = logDir)
        val sPost = spinProbeMs()
        val mPost = memProbeGBs()
        deleteRecursively(logDir)
        replayWalls = walls
        results("cdc_replay") = walls.sum
        // steady-state epoch: the best non-first epoch (batch 0 additionally
        // carries the empty-table first-commit shape)
        val st = walls.drop(1).min
        (nEvents / walls.sum, st, (nEvents / walls.size) / st, sPre, sPost, mPre, mPost)
      }

    val spinPost = spinProbeMs()
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val epochsJson = replayWalls.map(w => f"$w%.3f").mkString("[", ",", "]")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir","cdc_events_per_sec":$evps%.0f,"cdc_replay_events":$nEvents,"cdc_replay_epochs":$epochsJson,"cdc_replay_steady":$steady%.3f,"cdc_events_per_sec_steady":$evpsSteady%.0f,"spin_ms_pre":$spinPre%.0f,"spin_ms_post_queries":$spinPostQueries%.0f,"spin_ms_replay_pre":$spinReplayPre%.0f,"spin_ms_replay_post":$spinReplayPost%.0f,"spin_ms_post":$spinPost%.0f,"spin_ms_idle_ref":150,"mem_gbs_replay_pre":$memReplayPre%.1f,"mem_gbs_replay_post":$memReplayPost%.1f,"mem_gbs_idle_ref":10.5}""")
    spark.stop()
  }
}
