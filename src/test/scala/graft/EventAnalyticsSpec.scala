package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Semantic pins for the event-store analytics operators (q34–q38) on a
  * hand-computable fixture; the driver's DuckDB gate checks value
  * equality on the real tables — this suite pins the SEMANTICS (session
  * boundaries, strictly-prior as-of, funnel ordering, cohort offsets)
  * against answers derived by hand.
  */
class EventAnalyticsSpec extends SparkSuite {

  private def ts(day: Int, hour: Int, min: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:$min%02d:00")

  /** Fixture (all one parquet dir, schema = driver's events table):
    * user 1: events at d1 00:00, d1 01:00, d1 08:00 (gap 7h > 6h — new
    *         session), d2 09:00 (new session)  → sessions of 2, 1, 1
    * user 2: signup d1 10:00; click d1 11:00; purchase d1 12:00
    *         (complete 7d funnel; purchase's prior browse = the click)
    * user 3: signup d1 00:00; click d9 00:00 (outside 7d); purchase d9 01:00
    */
  private lazy val fixtureDir: String = {
    val dir = tmpDir("event-analytics") + "/t"
    val rows = Seq(
      // user 1 — sessionization shape (types don't matter for q34)
      (1L, ts(1, 0), 1L, "view", 1.0, "p"),
      (2L, ts(1, 1), 1L, "click", 2.0, "p"),
      (3L, ts(1, 8), 1L, "view", 3.0, "p"),
      (4L, ts(2, 9), 1L, "purchase", 40.0, "p"),
      // user 2 — complete funnel + as-of
      (5L, ts(1, 10), 2L, "signup", 0.0, "p"),
      (6L, ts(1, 11), 2L, "click", 6.5, "p"),
      (7L, ts(1, 12), 2L, "purchase", 99.0, "p"),
      // user 3 — funnel broken by the 7-day bound
      (8L, ts(1, 0), 3L, "signup", 0.0, "p"),
      (9L, ts(9, 0), 3L, "click", 1.0, "p"),
      (10L, ts(9, 1), 3L, "purchase", 5.0, "p"))
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  test("q34 sessionize: 6h gaps split sessions; bounds and counts are per-session") {
    val df = SparkEntry.queries("q34_sessionize")(spark, fixtureDir)
    val u1 = df.filter(col("user_id") === 1L).orderBy("session_seq")
      .select("session_seq", "n_events", "dur_us").collect()
    assert(u1.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L), (2L, 1L), (3L, 1L)))
    assert(u1.head.getLong(2) == 3600L * 1000000L) // session 1 spans exactly 1h
    // user 2: all three events within 2h -> one session
    assert(df.filter(col("user_id") === 2L).count() == 1)
  }

  test("q35 as-of: purchase picks the latest STRICTLY prior browse of the same user") {
    val df = SparkEntry.queries("q35_asof_join")(spark, fixtureDir)
    val rows = df.orderBy("purchase_id").collect()
    // user 1 purchase (event 4): last browse is event 3 (d1 08:00)
    val r1 = rows.find(_.getLong(rows.head.fieldIndex("purchase_id")) == 4L).get
    assert(r1.getLong(r1.fieldIndex("browse_event_id")) == 3L)
    // user 2 purchase (event 7): the click an hour earlier, not anything of user 1
    val r2 = rows.find(_.getLong(r1.fieldIndex("purchase_id")) == 7L).get
    assert(r2.getLong(r2.fieldIndex("browse_event_id")) == 6L)
    assert(r2.getLong(r2.fieldIndex("browse_to_buy_us")) == 3600L * 1000000L)
    assert(r2.getDouble(r2.fieldIndex("browsed_value")) == 6.5)
  }

  test("q36 funnel: 7-day bound drops user 3 at the click step") {
    val df = SparkEntry.queries("q36_funnel_steps")(spark, fixtureDir)
    val steps = df.orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    // signups: users 2,3; clicks within 7d of signup: user 2 only; then purchase: user 2
    assert(steps == Seq((1, "signup", 2L), (2, "click_7d", 1L), (3, "purchase_7d", 1L)))
  }

  test("q37 retention: day offsets are relative to each user's first-seen day") {
    val df = SparkEntry.queries("q37_retention_cohort")(spark, fixtureDir)
    val jan1 = df.filter(col("cohort_day") === lit(Timestamp.valueOf("2024-01-01 00:00:00")))
      .orderBy("day_n").select("day_n", "n_active").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    // cohort 2024-01-01 = users 1,2,3; active day 0: all 3; day 1: user 1; day 8: user 3
    assert(jan1 == Seq((0, 3L), (1, 1L), (8, 1L)))
  }

  test("q39 scd2 intervals: anchors chain [from, to) per user; only the last is current") {
    val df = SparkEntry.queries("q39_scd2_intervals")(spark, fixtureDir)
    // user 2: signup(5) -> purchase(7); the click is not an anchor
    val u2 = df.filter(col("user_id") === 2L).orderBy("version_seq").collect()
      .map(r => (r.getInt(r.fieldIndex("version_seq")), r.getString(r.fieldIndex("status")),
        r.getLong(r.fieldIndex("valid_from_id")),
        if (r.isNullAt(r.fieldIndex("valid_to_id"))) None else Some(r.getLong(r.fieldIndex("valid_to_id"))),
        r.getInt(r.fieldIndex("is_current")))).toSeq
    assert(u2 == Seq((0, "signup", 5L, Some(7L), 0), (1, "purchase", 7L, None, 1)))
    // user 1: one anchor (purchase 4), current
    assert(df.filter(col("user_id") === 1L).count() == 1)
    assert(df.filter(col("is_current") === 1).count() ===
      df.select("user_id").distinct().count())
  }

  test("q38 window agg: one UTC-day tumbling window per (day, type) with exact counts") {
    val df = SparkEntry.queries("q38_window_agg")(spark, fixtureDir)
    val d1views = df.filter(col("w_start") === lit(Timestamp.valueOf("2024-01-01 00:00:00")) &&
      col("event_type") === "view").collect()
    assert(d1views.length == 1)
    assert(d1views.head.getAs[Long]("n") == 2L) // events 1 and 3
    // total distinct windows: days 1, 2, 9
    assert(df.select("w_start").distinct().count() == 3)
  }

  test("q52 render: one doc per user, lines in event_id order regardless of input order") {
    val df = SparkEntry.queries("q52_render_transcript")(spark, fixtureDir)
    assert(df.count() == 3)
    val u1 = df.filter(col("user_id") === 1L).collect().head
    assert(u1.getAs[Long]("n_events") == 4L)
    assert(u1.getAs[Long]("first_event_id") == 1L && u1.getAs[Long]("last_event_id") == 4L)
    assert(u1.getAs[String]("transcript") ==
      "view:p\nclick:p\nview:p\npurchase:p")
    // order determinism: the fixture written in reverse yields the same doc
    val rev = tmpDir("event-analytics-rev") + "/t"
    spark.read.parquet(s"$fixtureDir/events.parquet").orderBy(col("event_id").desc)
      .coalesce(1).write.parquet(s"$rev/events.parquet")
    val u1r = SparkEntry.queries("q52_render_transcript")(spark, rev)
      .filter(col("user_id") === 1L).collect().head
    assert(u1r.getAs[String]("transcript") == u1.getAs[String]("transcript"))
  }
}
