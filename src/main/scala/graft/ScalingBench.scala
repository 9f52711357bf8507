package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Two-parallelism scaling evidence for the north rule (BASELINE.json:
  * ≥0.8 throughput scaling efficiency from N to 4N executors). No real
  * cluster exists in the sandbox, so the same CDC replay runs at
  * local[8] and local[32] on identical seeded input; efficiency =
  * (throughput_32 / throughput_8) / 4. Each level runs in its own JVM
  * (a second SparkContext in one JVM inherits degraded state).
  *
  * Usage:  runMain graft.ScalingBench 8 [numEvents]
  *         runMain graft.ScalingBench 32 [numEvents]
  * After both, BENCH/BASELINE.md is (re)written from the recorded runs.
  *
  * North-rule-scale batches: the 10^10-event design point implies
  * multi-million-event micro-batches, where the parallel region (fold,
  * merge join, sort, compress) dominates fixed per-batch driver cost.
  * Small batches measure scheduler overhead, not the engine.
  */
object ScalingBench {

  private val benchDir = "/root/repo/BENCH"

  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(8)
    val nEvents = args.drop(1).headOption.map(_.toLong).getOrElse(24000000L)

    // identical session config to graft.Bench (ONE shared builder) so the
    // driver-protocol replay and this scaling evidence measure the same
    // engine configuration
    val spark = Bench.session(cores, s"graft-scaling-$cores")
    val tmpBase = Bench.tmpBase
    // warm-up so JIT/codegen/classloading doesn't pollute the measured run
    val warmDir = Files.createTempDirectory(tmpBase, "warm").toString
    Bench.replay(spark, 1000000L, 2, 128, warmDir)
    val logDir = Files.createTempDirectory(tmpBase, s"graft-scale-log-$cores").toString
    // best-of-2: the sandbox VM shows ±2x run-to-run noise; min wall time
    // is the standard estimator of true capability under noisy neighbors.
    // Each run is bracketed by BOTH probes — the CPU spin loop and the
    // memory-bandwidth triad (the noise that moves this workload is
    // bandwidth contention, which clean spin probes do not see).
    val perRun = (1 to 2).map { r =>
      val spinPre = Bench.spinProbeMs(); val memPre = Bench.memProbeGBs()
      val s = Bench.replay(spark, nEvents, numBatches = 2, buckets = 128, logDir = logDir).sum
      val spinPost = Bench.spinProbeMs(); val memPost = Bench.memProbeGBs()
      println(f"[scaling] run $r: $s%.1fs (spin $spinPre%.0f/$spinPost%.0f ms idle~150; " +
        f"mem $memPre%.1f/$memPost%.1f GB/s idle~10.5)")
      s
    }
    val sec = perRun.min
    spark.stop()
    Bench.deleteRecursively(warmDir); Bench.deleteRecursively(logDir)
    val evps = nEvents / sec
    println(f"[scaling] local[$cores]: $nEvents events in $sec%.1fs = $evps%.0f events/s (best of ${perRun.size})")

    Files.createDirectories(Paths.get(benchDir))
    Files.writeString(Paths.get(s"$benchDir/scaling-$cores.tsv"), f"$cores\t$nEvents\t$sec%.2f\t$evps%.1f\n")

    val runs = Seq(8, 32).flatMap { c =>
      val p = Paths.get(s"$benchDir/scaling-$c.tsv")
      if (Files.exists(p)) {
        val f = Files.readString(p).trim.split("\t")
        Some((f(0).toInt, f(1).toLong, f(2).toDouble, f(3).toDouble))
      } else None
    }
    if (runs.size == 2) {
      val Seq((_, n8, s8, e8), (_, _, s32, e32)) = runs
      val eff = (e32 / e8) / 4.0
      val md =
        f"""# BENCH — scaling evidence (north rule: ≥0.8 efficiency N→4N)
           |
           |Same CDC replay job ($n8%,d change events, 2 epochs, 128 buckets,
           |identical seeded input, fresh JVM per level, best-of-2 runs — the
           |sandbox VM shows ±2x noisy-neighbor variance) at two parallelism
           |levels, per the driver's two-cluster-size protocol (no real
           |cluster in the sandbox).
           |
           || parallelism | wall time (s) | throughput (events/s) |
           ||---|---|---|
           || local[8]  | $s8%.1f | $e8%.0f |
           || local[32] | $s32%.1f | $e32%.0f |
           |
           |**Scaling efficiency (8→32 cores, ×4): $eff%.2f** (target ≥ 0.8)
           |
           |The replay is the full pipeline: parquet log scan → validate →
           |per-key fold (hash aggregation) → bucket-pruned copy-on-write
           |merge → sorted zstd parquet write (bloom on conv_id) + atomic
           |snapshot commit. Shuffle partitions = core count; AQE on;
           |committer algorithm v2.
           |""".stripMargin
      // raw tool output — BENCH/BASELINE.md is the curated evidence doc
      Files.writeString(Paths.get(s"$benchDir/scaling-latest.md"), md)
      println(f"[scaling] efficiency = $eff%.2f -> BENCH/scaling-latest.md")
    }
  }
}
