package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.gen.ChangeLogGen
import graft.operators.CdcApply
import graft.table.IceLite

/** Measured evidence for bucket-count evolution (B11): build a CDC table
  * at a deliberately undersized bucket count, time `rebucket` to a wider
  * layout, and compare point-read pruning before/after. Prints [rbb]
  * lines; results are recorded in BENCH/rebucket.md.
  *
  * Usage: runMain graft.RebucketBench [numEvents] [fromBuckets] [toBuckets]
  */
object RebucketBench {
  def main(args: Array[String]): Unit = {
    val nEvents = args.headOption.map(_.toLong).getOrElse(24000000L)
    val from = args.drop(1).headOption.map(_.toInt).getOrElse(32)
    val to = args.drop(2).headOption.map(_.toInt).getOrElse(256)

    val spark = Bench.session(32, "graft-rebucket-bench")
    val tmpBase = Bench.tmpBase
    val logDir = Files.createTempDirectory(tmpBase, "rbb-log").toString
    val cfg = ChangeLogGen.GenConfig(
      numEvents = nEvents, numConvs = math.max(100, (nEvents / 100).toInt),
      maxTurns = 50, logPartitions = 96)
    ChangeLogGen.writeLog(spark, cfg, logDir, chunks = 2)
    val log = spark.read.parquet(logDir)

    val dir = Files.createTempDirectory(tmpBase, "rbb-table").toString
    val table = IceLite.create(s"$dir/t", graft.model.Schemas.transcript, from)
    val spec = graft.model.MergeSpec(numBuckets = from)
    (0 until 2).foreach { b =>
      CdcApply.applyBatch(spark, table, log.filter(col("chunk") === b).drop("chunk"),
        spec, epoch = Some(("rbb", b.toLong)))
    }
    val rows0 = table.read(spark).count()

    def pointRead(buckets: Int): (Double, Int, Long) = {
      val probe = "c00000007"
      val bkt = spark.range(1)
        .select(IceLite.bucketOf(lit(probe), buckets)).collect()(0).getInt(0)
      val nFiles = table.dataFiles(Some(Set(bkt))).size + table.deltaFiles(Some(Set(bkt))).size
      // best-of-3 wall for the pruned point read (scheduler noise floor)
      val walls = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = table.read(spark, Some(Set(bkt))).filter(col("conv_id") === probe).count()
        require(n > 0, "probe conversation must exist")
        (System.nanoTime() - t0) / 1e9
      }
      (walls.min, nFiles, table.dataFiles(None).size + table.deltaFiles(None).size.toLong)
    }

    val (w0, f0, tot0) = pointRead(from)
    println(f"[rbb] before: $rows0 rows in $from buckets; point read $w0%.2fs scanning $f0 of $tot0 files")

    val t0 = System.nanoTime()
    val snap = table.rebucket(spark, to)
    val rebucketWall = (System.nanoTime() - t0) / 1e9
    println(f"[rbb] rebucket $from -> $to: $rebucketWall%.1fs for $rows0 rows " +
      f"(${rows0 / rebucketWall}%.0f rows/s one-exchange rewrite), snapshot v${snap.version}")

    val rows1 = table.read(spark).count()
    val (w1, f1, tot1) = pointRead(to)
    println(f"[rbb] after: $rows1 rows in $to buckets; point read $w1%.2fs scanning $f1 of $tot1 files")
    println(s"[rbb] state preserved: ${rows0 == rows1}; " +
      f"pruning improvement: $f0 -> $f1 files per point read")

    // epoch apply cost under the new layout (same batch shape as before)
    val extraLog = Files.createTempDirectory(tmpBase, "rbb-log2").toString
    ChangeLogGen.writeLog(spark, cfg.copy(numEvents = nEvents / 2, seed = cfg.seed + 1),
      extraLog, chunks = 1)
    val t1 = System.nanoTime()
    CdcApply.applyBatch(spark, table, spark.read.parquet(extraLog).drop("chunk"),
      graft.model.MergeSpec(numBuckets = to), epoch = Some(("rbb", 2L)))
    println(f"[rbb] post-rebucket epoch (${nEvents / 2} events): ${(System.nanoTime() - t1) / 1e9}%.1fs")

    spark.stop()
    Bench.deleteRecursively(logDir); Bench.deleteRecursively(extraLog); Bench.deleteRecursively(dir)
  }
}
