package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.gen.ChangeLogGen
import graft.operators.MergeEngine
import graft.table.IceLite

/** Dev-only phase profiler for the CDC replay (not part of the contract). */
object ProfileReplay {
  def main(args: Array[String]): Unit = {
    val nEvents = args.headOption.map(_.toLong).getOrElse(500000L)
    val spark = SparkSession.builder().master(sys.env.getOrElse("PROF_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("PROF_SHUFFLE", "32")).config("spark.sql.adaptive.enabled", sys.env.getOrElse("PROF_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cfg = ChangeLogGen.GenConfig(numEvents = nEvents, numConvs = (nEvents / 100).toInt,
      maxTurns = 50, logPartitions = 32)
    val logDir = java.nio.file.Files.createTempDirectory("prof-log").toString
    ChangeLogGen.writeLog(spark, cfg, logDir, chunks = 4)
    val log = spark.read.parquet(logDir)
    val dir = java.nio.file.Files.createTempDirectory("prof-table").toString
    val table = IceLite.create(s"$dir/t", graft.model.Schemas.transcript, 64)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof]   $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }

    (0 until 4).foreach { b =>
      println(s"[prof] batch $b")
      val events = log.filter(col("chunk") === b).drop("chunk")
      val tb = System.nanoTime()
      val valid = MergeEngine.validate(events).valid
      val wipes = MergeEngine.seriesWipes(valid)
      val actions = MergeEngine.netActions(valid, wipes)
      val evolved = graft.model.Schemas.transcript
      val normRow = struct(evolved.fields.toSeq.map(f => col(s"row.${f.name}").cast(f.dataType).as(f.name)): _*)
      val normActions = actions.withColumn("row", normRow)

      val touched = time("touched") {
        valid.select(MergeEngine.bucketOf(col("conv_id"), 64).as("b")).distinct().collect().map(_.getInt(0)).toSet
      }
      val lineage = time("lineage") {
        MergeEngine.tagErrors(events).groupBy("partition")
          .agg(max("offset").as("max_off"), count(lit(1)).as("n")).collect()
      }
      val base = {
        val files = table.dataFiles(Some(touched))
        if (files.isEmpty) spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), evolved)
        else spark.read.schema(evolved).parquet(files: _*)
      }
      val merged = MergeEngine.merge(base, normActions, wipes)
      val stage = table.newStageDir()
      time("merge+write") {
        merged.withColumn("bucket", MergeEngine.bucketOf(col("conv_id"), 64))
          .repartition(64, col("bucket"))
          .sortWithinPartitions("bucket", "conv_id", "turn_idx")
          .write.mode("overwrite")
          .option("compression", sys.env.getOrElse("PROF_CODEC", "zstd"))
          .option("parquet.bloom.filter.enabled#conv_id", sys.env.getOrElse("PROF_BLOOM", "true"))
          .partitionBy("bucket").parquet(stage.toString)
      }
      val staged = table.stagedFilesByBucket(stage)
      val rows = time("footer-count") {
        spark.read.schema(evolved).parquet(staged.values.flatten.map(r => s"${table.dir}/$r").toSeq: _*).count()
      }
      time("commit") {
        table.commit(p => p.copy(files = (p.files -- touched.toSeq) ++ staged))
      }
      println(f"[prof]   TOTAL batch: ${(System.nanoTime() - tb) / 1e9}%.2fs rows=$rows")
    }
    spark.stop()
  }
}
