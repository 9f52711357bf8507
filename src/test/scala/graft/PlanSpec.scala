package graft

import org.apache.spark.sql.functions._

/** Physical-plan assertions: the Spark-first design claims (pushdown,
  * pruning, broadcast, codegen, bucket pruning) hold in the actual plans,
  * not just in comments. Uses explain(formatted) output.
  */
class PlanSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("filter + projection are pushed into the parquet scan (q02)") {
    val plan = planOf(SparkEntry.queries("q02_filter_project")(spark, dir))
    assert(plan.contains("PushedFilters:") && plan.contains("GreaterThanOrEqual(l_discount"), plan)
    // column pruning: the scan reads only the needed columns, not l_tax etc.
    val readSchema = plan.linesIterator.find(_.trim.startsWith("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_tax") && readSchema.contains("l_extendedprice"), readSchema)
  }

  test("small dimensions are broadcast (q04)") {
    val plan = planOf(SparkEntry.queries("q04_broadcast_join")(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("whole-stage codegen covers the aggregation pipeline (q01)") {
    // AQE shows codegen spans only on the executed plan
    val df = SparkEntry.queries("q01_agg_pricing")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("), plan.take(1500))
  }

  test("the CDC fold hash-aggregates and never sorts the payload (fold=join)") {
    import TestHelpers._
    val events = eventsDF(spark, Seq(ins(0, "c1", 0, "a"), upd(1, "c1", 0, "b")))
    val wipes = graft.operators.MergeEngine.seriesWipes(events)
    val plan = planOf(graft.operators.MergeEngine.netActionsViaJoin(events, wipes))
    assert(plan.contains("HashAggregate"), plan.take(2000))
    assert(!plan.contains("SortAggregate"),
      "fold aggregation must stay all-primitive (struct buffers force SortAggregate)")
    assert(!plan.contains("Window"), "fold must not use window functions")
  }

  test("fold=agg (comparison strategy) is the SortAggregate shape it claims to be") {
    import TestHelpers._
    val events = eventsDF(spark, Seq(ins(0, "c1", 0, "a")))
    val plan = planOf(graft.operators.MergeEngine.netActions(events))
    assert(plan.contains("Aggregate"), plan.take(1000))
  }

  test("fold=window: one sort, a Window node, no aggregate of the payload") {
    import TestHelpers._
    val events = eventsDF(spark, Seq(ins(0, "c1", 0, "a"), upd(1, "c1", 0, "b"), ins(2, "c2", 0, "c")))
    val wipes = broadcast(graft.operators.MergeEngine.seriesWipes(events))
    val plan = planOf(graft.operators.MergeEngine.netActionsViaWindow(events, wipes))
    assert(plan.contains("Window"), plan.take(2000))
    assert(!plan.contains("SortAggregate"),
      "the window fold exists to avoid the agg fold's partial+final payload sorts")
    // exactly one Sort of the batch (the window's); the agg fold plans two
    val sorts = plan.linesIterator.count(_.trim.matches("""\(\d+\) Sort(?:\s.*)?"""))
    assert(sorts == 1, s"expected 1 Sort, got $sorts:\n${plan.take(3000)}")
    // row_number and the anchor max share ONE WindowExec (CollapseWindow
    // fires because the anchor struct is pre-projected, keeping the two
    // Window nodes adjacent) — each group's rows are buffered once
    val windows = plan.linesIterator.count(_.trim.matches("""\(\d+\) Window(?:\s.*)?"""))
    assert(windows == 1, s"expected 1 Window node, got $windows:\n${plan.take(3000)}")
  }

  test("fold=window equals fold=agg on net actions (both alignments)") {
    import TestHelpers._
    val evs = Seq(
      ins(0, "c1", 0, "a"), upd(1, "c1", 0, "b"), del(2, "c1", Some(0)),
      ins(3, "c2", 1, "x"), upd(4, "c2", 1, "y"), ins(5, "c3", 0, "z"),
      del(6, "c3", None), ins(7, "c3", 1, "w"), upd(8, "c4", 2, "u"),
      ups(9, "c5", 0, "v"), del(10, "c5", Some(0)), upd(11, "c5", 0, "ghost"),
      // duplicate delivery of an identical row: either pick is the same row
      ins(3, "c2", 1, "x"))
    val events = eventsDF(spark, evs)
    val wipes = broadcast(graft.operators.MergeEngine.seriesWipes(events))
    val agg = graft.operators.MergeEngine.netActions(events, wipes)
      .orderBy("conv_id", "turn_idx").collect().map(_.toString).toSeq
    val win = graft.operators.MergeEngine.netActionsViaWindow(events, wipes)
      .orderBy("conv_id", "turn_idx").collect().map(_.toString).toSeq
    val winB = graft.operators.MergeEngine.netActionsViaWindow(events, wipes, Some(8))
      .drop("bucket").orderBy("conv_id", "turn_idx").collect().map(_.toString).toSeq
    assert(agg == win, s"agg:    $agg\nwindow: $win")
    assert(agg == winB, s"agg:      $agg\nwindow/b: $winB")
  }

  test("bucket-aligned fold: the payload crosses exactly ONE exchange") {
    import TestHelpers._
    val events = eventsDF(spark, Seq(ins(0, "c1", 0, "a"), upd(1, "c1", 0, "b"), ins(2, "c2", 0, "c")))
    val wipes = broadcast(graft.operators.MergeEngine.seriesWipes(events))
    val df = graft.operators.MergeEngine.netActions(events, wipes, Some(8))
    val plan = planOf(df)
    // the one REPARTITION_BY_NUM exchange onto the bucket key; no
    // ENSURE_REQUIREMENTS exchange may reappear for the fold agg —
    // HashPartitioning(bucket) satisfies its ClusteredDistribution
    // because bucket is one of the grouping keys
    val shuffles = plan.linesIterator.filter(l =>
      l.trim.startsWith("Arguments: hashpartitioning")).toSeq
    assert(shuffles.size == 1, s"expected 1 shuffle, got:\n${shuffles.mkString("\n")}\n${plan.take(3000)}")
    assert(shuffles.head.contains("REPARTITION_BY_NUM"), shuffles.head)
    assert(df.columns.contains("bucket"), df.columns.mkString(","))
  }

  test("bucket-aligned and key-aligned folds produce identical net actions") {
    import TestHelpers._
    val evs = Seq(
      ins(0, "c1", 0, "a"), upd(1, "c1", 0, "b"), del(2, "c1", Some(0)),
      ins(3, "c2", 1, "x"), upd(4, "c2", 1, "y"), ins(5, "c3", 0, "z"),
      del(6, "c3", None), ins(7, "c3", 1, "w"), upd(8, "c4", 2, "u"))
    val events = eventsDF(spark, evs)
    val wipes = broadcast(graft.operators.MergeEngine.seriesWipes(events))
    val keyed = graft.operators.MergeEngine.netActions(events, wipes)
    val bucketed = graft.operators.MergeEngine.netActions(events, wipes, Some(8))
    val a = keyed.orderBy("conv_id", "turn_idx").collect().map(_.toString).toSeq
    val b = bucketed.drop("bucket").orderBy("conv_id", "turn_idx").collect().map(_.toString).toSeq
    assert(a == b, s"key:    $a\nbucket: $b")
  }

  test("IceLite point read scans only the target bucket's files") {
    import TestHelpers._
    val d = tmpDir("planspec") + "/t"
    val t = graft.table.IceLite.create(d, turnSchema, 16)
    val evs = (0 until 64).map(i => ins(i.toLong, f"c$i%02d", 0, s"v$i"))
    graft.operators.CdcApply.applyBatch(spark, t, eventsDF(spark, evs),
      spec = graft.model.MergeSpec(mergeStrategy = "cow"))
    val b = spark.range(1)
      .select(graft.operators.MergeEngine.bucketOf(lit("c07"), 16)).collect()(0).getInt(0)
    val pruned = t.read(spark, Some(Set(b)))
    val allFiles = t.dataFiles().size
    val scanned = pruned.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f })
      .map(_.relation.location.inputFiles.length).sum
    assert(scanned < allFiles, s"scanned $scanned of $allFiles")
  }

  test("events parquet scan prunes to envelope columns used by the planning aggregate") {
    import TestHelpers._
    val d = tmpDir("planspec-scan")
    eventsDF(spark, Seq(ins(0, "c1", 0, "a"))).write.parquet(s"$d/ev")
    val fromDisk = spark.read.parquet(s"$d/ev")
    // the exact MOR-path narrow planning aggregate (r06): no _error
    // reference anywhere — an aggregate touching _error reads the WHOLE
    // after struct (IsNull over a struct defeats nested-schema pruning),
    // which is why the rejected count moved to an observed metric on the
    // fold's own scan
    val plan = planOf(
      fromDisk.groupBy("partition").agg(max("offset").as("max_off"), count(lit(1)).as("n")))
    val readSchema = plan.linesIterator.find(_.trim.startsWith("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("after"),
      s"narrow planning scan must not read the after struct at all: $readSchema")
    // and the narrow wipe aggregate stays off the payload too
    val wipePlan = planOf(graft.operators.MergeEngine.seriesWipes(
      fromDisk.filter(col("conv_id").isNotNull)))
    val wipeRead = wipePlan.linesIterator.find(_.trim.startsWith("ReadSchema")).getOrElse("")
    assert(!wipeRead.contains("after"),
      s"wipe aggregate scan must not read the after struct: $wipeRead")
  }
}
