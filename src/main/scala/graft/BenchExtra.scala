package graft

import org.apache.spark.sql.SparkSession

/** Round-6 optimization harness (NOT part of the driver contract —
  * Bench.scala stays the frozen measured surface). Times individual
  * queries with the noop sink (guide §1.4: forces every column, no
  * count-only pruning) over repeated samples, so per-query changes can
  * be measured in isolation in the same session config as Bench.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *   BENCHX_ONLY=q19,q21 BENCHX_SAMPLES=3 sbt "runMain graft.BenchExtra"
  *
  * Memoized-pipeline queries (q19/q21 builders) report their FIRST
  * sample separately (build cost) from the rest (cached-read cost).
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val samples = sys.env.getOrElse("BENCHX_SAMPLES", "3").toInt
    val only = sys.env.get("BENCHX_ONLY").map(_.split(",").map(_.trim).toSet)
    val spark = Bench.session(cpus.toInt, "graft-benchx")

    // same untimed warmup family as Bench
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet").limit(64).count()
      SparkEntry.queries.get("q02_filter_project").foreach(_(spark, sfDir).count())
      val wd = java.nio.file.Files.createTempDirectory(Bench.tmpBase, "graft-benchx-warm").toString
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
        Bench.deleteRecursively(wd)
      }
    } catch { case _: Throwable => () }

    val out = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
      .foreach { case (name, fn) =>
        spark.sparkContext.setJobDescription(s"benchx:$name")
        // BENCHX_CLEAR=1: evict the memoized dedup pipeline before every
        // sample, so each sample re-times the BUILD (min-of-N build cost
        // is comparable across contended host windows; a single build
        // sample is not)
        val clear = sys.env.get("BENCHX_CLEAR").contains("1")
        val times = (0 until samples).map { _ =>
          if (clear) graft.queries.ContentQueries.clearShared(spark)
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        out(name) = times
        System.err.println(f"[benchx] $name: ${times.map(t => f"$t%.3f").mkString(", ")}")
        spark.sparkContext.setJobDescription(null)
      }
    val js = out.map { case (k, v) =>
      "\"" + k + "\":[" + v.map(t => f"$t%.3f").mkString(",") + "]"
    }.mkString("{", ",", "}")
    println(s"""{"benchx":$js,"sf":"$sfDir","samples":$samples}""")
    spark.stop()
  }
}
