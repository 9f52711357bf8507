package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dumps `.explain("formatted")` for the round-6 optimization targets to
  * plans/r06/<query>_<tag>.txt (tag = args(0), e.g. "before"/"after").
  * Uses the SAME session shape as Bench (cores/shuffle partitions/AQE)
  * so the dumped initial plans match what the bench executes.
  */
object PlansR06 {
  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("before")
    val names: Seq[String] =
      if (args.length > 1) args(1).split(",").map(_.trim).toSeq
      else Seq(
        "q03_join_agg", "q18_dedup_exact", "q19_dedup_minhash_lsh",
        "q21_dedup_ngram_jaccard", "q25_text_fingerprint", "q32_dedup_keeplist",
        "q41_contamination", "q44_train_manifest", "q45_text_repetition",
        "q46_keyword_tfidf", "q47_vocab_stats")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-plans-r06")
    val outDir = Paths.get(sys.env.getOrElse("PLANS_R06_DIR", "plans/r06"))
    Files.createDirectories(outDir)
    names.foreach { name =>
      // "cdc_fold" is the replay's per-key fold, not a declared query:
      // before = netActions (the r05 default aggregate fold), after =
      // netActionsViaWindow (the r06 default single-sort window fold),
      // dumped over a generated change-log batch with the bench schema.
      val df =
        if (name == "cdc_fold") {
          val events = graft.gen.ChangeLogGen.events(spark,
            graft.gen.ChangeLogGen.GenConfig(numEvents = 100000L))
          val wipes = org.apache.spark.sql.functions.broadcast(
            graft.operators.MergeEngine.seriesWipes(events))
          if (tag == "before") graft.operators.MergeEngine.netActions(events, wipes)
          else graft.operators.MergeEngine.netActionsViaWindow(events, wipes)
        } else SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.write(outDir.resolve(s"${name}_$tag.txt"), txt.getBytes("UTF-8"))
      System.err.println(s"[plans] wrote ${name}_$tag.txt (${txt.length} chars)")
    }
    graft.queries.ContentQueries.clearShared(spark)
    spark.stop()
  }
}
