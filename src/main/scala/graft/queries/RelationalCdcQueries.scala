package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational-operator and CDC-semantics queries over the driver test
  * tables, each with a DuckDB-equivalent oracle (SparkEntry contract).
  *
  * Determinism rules for the hash compare:
  *  - no raw double SUMs — cast to DECIMAL(18,4) per element first
  *    (double aggregation order differs between engines);
  *  - passthrough doubles are fine (bit-identical storage);
  *  - every computed column aliased identically in Spark and SQL.
  */
object RelationalCdcQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private val dec = "decimal(18,4)"
  // The SUM itself runs in decimal (exact, aggregation-order independent),
  // but the FINAL value is cast to DOUBLE on both engine and oracle sides:
  // the driver's hasher serializes DECIMAL-typed columns differently per
  // engine even when values and declared types match (verified round 2), so
  // decimal must not appear in a result schema. One exact decimal -> one
  // double is bit-identical on both sides.
  private val decSum = "double"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- scan + aggregate (TPC-H Q1 shape; reference has no aggs of its
    //    own — this is the engine's groupBy/agg surface) -----------------
    "q01_agg_pricing" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(dec)).cast(decSum).as("sum_qty"),
          sum(col("l_extendedprice").cast(dec)).cast(decSum).as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(dec)).cast(decSum).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    }),

    // -- filter + projection pushdown ------------------------------------
    "q02_filter_project" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_discount") >= 0.07 && col("l_quantity") < 10)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"), col("l_shipdate"))
    }),

    // -- multi-way equi-join + aggregate ----------------------------------
    "q03_join_agg" -> ((s, dir) => {
      val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(dec)).cast(decSum).as("revenue"),
          countDistinct(col("o_orderkey")).as("n_orders"),
          count(lit(1)).as("n_lines"))
    }),

    // -- broadcast dimension join (small dims -> broadcast hash join) ----
    "q04_broadcast_join" -> ((s, dir) => {
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      val n = t(s, dir, "nation"); val r = t(s, dir, "region")
      o.join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_orders"), sum(col("o_totalprice").cast(dec)).cast(decSum).as("total"))
    }),

    // -- window ranking (the engine's LWW primitive) ----------------------
    "q05_window_topn" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
    }),

    // -- global sort + top-k ----------------------------------------------
    "q06_sort_topk" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .limit(10)
    }),

    // -- set operation (EXCEPT DISTINCT) ----------------------------------
    "q07_set_except" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.select(col("o_custkey")).except(
        o.filter(col("o_totalprice") > 400000).select(col("o_custkey")))
    }),

    // -- anti join (tombstone-delete shape: NOT EXISTS) -------------------
    "q08_anti_join" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      c.join(o.filter(col("o_totalprice") > 300000), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    // -- scalar functions (case/substr/date parts) ------------------------
    "q09_scalar_funcs" -> ((s, dir) => {
      t(s, dir, "orders").select(
        col("o_orderkey"),
        upper(col("o_orderpriority")).as("pri_u"),
        substring(col("o_orderpriority"), 1, 1).as("pri_c"),
        length(col("o_orderstatus")).as("st_len"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        date_trunc("month", col("o_orderdate")).as("mth"))
    }),

    // -- JSON-ish payload extraction (the reference's payload column,
    //    README.md:97-102) -------------------------------------------------
    "q10_payload_extract" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("k", regexp_extract(col("props"), "([0-9]+)", 1).cast("long"))
        .groupBy(pmod(col("k"), lit(10)).as("k_mod"))
        .agg(count(lit(1)).as("n"), min(col("k")).as("k_min"), max(col("k")).as("k_max"))
    }),

    // ======== CDC semantics over the events stream table ==============
    // mapping: signup=insert, purchase=upsert, click/view=update,
    // error=delete; event_id is the offset-order authority.

    // -- last-writer-wins per key (window formulation, A5/A6) -------------
    "q11_cdc_latest_event" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id").desc)
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_type"), col("value").as("last_value"))
    }),

    // -- the engine's anchor/update net-state fold on real data (A5-A10) --
    // r06: the anchor TYPE is carried through the aggregation as an int
    // code, not the string — a single string max_by buffer forces the
    // whole aggregate to SortAggregate (string buffers cannot
    // hash-aggregate); with every buffer primitive it plans as one
    // map-side-combined HashAggregate. Decoded after the fold —
    // identical output values.
    "q12_cdc_upsert_fold" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val isAnchor = col("event_type").isin("signup", "purchase", "error")
      val aOff = when(isAnchor, col("event_id"))
      val uOff = when(!isAnchor, col("event_id"))
      val typeCode = when(col("event_type") === "signup", 0)
        .when(col("event_type") === "purchase", 1)
        .when(col("event_type") === "error", 2)
      e.groupBy(col("user_id"))
        .agg(
          max(aOff).as("a_id"),
          max_by(typeCode, aOff).as("a_code"),
          max_by(col("value"), aOff).as("a_value"),
          max(uOff).as("u_id"),
          max_by(col("value"), uOff).as("u_value"))
        .filter(col("a_id").isNotNull && col("a_code") =!= 2)
        .select(
          col("user_id"),
          when(col("a_code") === 0, "signup").otherwise("purchase").as("status"),
          when(col("u_id") > col("a_id"), col("u_value")).otherwise(col("a_value")).as("value"),
          greatest(col("a_id"), coalesce(col("u_id"), lit(-1L))).as("src_event_id"))
    }),

    // -- tombstone anti-join: drop all rows of deleted keys (A10) ---------
    "q13_cdc_tombstone" -> ((s, dir) => {
      val e = t(s, dir, "events")
      // "last anchor is an error" ⟺ the max error event id IS the max
      // anchor event id (event_id unique). Two long max buffers
      // hash-aggregate; the previous max_by(event_type, ...) carried a
      // string buffer and forced SortAggregate (r06).
      val dead = e.filter(col("event_type").isin("signup", "purchase", "error"))
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "error", col("event_id"))).as("err_id"),
          max(col("event_id")).as("max_id"))
        .filter(col("err_id") === col("max_id")).select(col("user_id"))
      // no broadcast hint: the dead-key set is O(deleted users) — unbounded
      // at scale. AQE broadcasts it at runtime when it is actually small.
      e.join(dead, Seq("user_id"), "left_anti")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"), max(col("event_id")).as("last_event"))
    }),

    // -- record validation split counts (A2) -------------------------------
    "q14_cdc_validate" -> ((s, dir) => {
      t(s, dir, "events").agg(
        sum(when(!col("event_type").isin("signup", "purchase", "error", "click", "view"), 1L).otherwise(0L)).as("bad_op"),
        sum(when(col("value").isNull, 1L).otherwise(0L)).as("null_value"),
        sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("null_key"),
        count(lit(1)).as("total"))
    }),

    // -- schema-drift-tolerant union (ALTER-ADD semantics, A13) ------------
    "q15_cdc_schema_drift" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val v1 = e.filter(col("event_id") < 5000).select(col("event_id"), col("user_id")) // pre-drift: no props
      val v2 = e.filter(col("event_id") >= 5000).select(col("event_id"), col("user_id"), col("props"))
      v1.unionByName(v2, allowMissingColumns = true)
        .groupBy(when(col("props").isNull, "v1").otherwise("v2").as("schema_v"))
        .agg(count(lit(1)).as("n"), max(col("event_id")).as("max_id"))
    }),

    // -- per-partition lineage metrics (A14) --------------------------------
    "q16_cdc_lineage" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(pmod(col("user_id"), lit(8)).as("log_partition"))
        .agg(count(lit(1)).as("n"), max(col("event_id")).as("max_off"), min(col("event_id")).as("min_off"))
    }),

    // -- bucket pruning (B1: hash-partitioned layout point query) ----------
    "q17_cdc_bucket_prune" -> ((s, dir) => {
      t(s, dir, "events")
        .filter(pmod(col("user_id"), lit(16)) === 3)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("value").cast(dec)).cast(decSum).as("total_value"))
    }))

  val oracleSql: Map[String, String] = Map(
    "q01_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_shipdate
        |FROM lineitem WHERE l_discount >= 0.07 AND l_quantity < 10""".stripMargin,
    "q03_join_agg" ->
      """SELECT c_mktsegment,
        | CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        | count(DISTINCT o_orderkey) AS n_orders, count(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q04_broadcast_join" ->
      """SELECT r_name, n_name, count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q05_window_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        | FROM orders) WHERE rn <= 2""".stripMargin,
    "q06_sort_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC LIMIT 10""".stripMargin,
    "q07_set_except" ->
      """SELECT o_custkey FROM orders
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_totalprice > 400000""".stripMargin,
    "q08_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)""".stripMargin,
    "q09_scalar_funcs" ->
      """SELECT o_orderkey, upper(o_orderpriority) AS pri_u,
        | substring(o_orderpriority, 1, 1) AS pri_c, CAST(length(o_orderstatus) AS INT) AS st_len,
        | CAST(year(o_orderdate) AS INT) AS y, CAST(month(o_orderdate) AS INT) AS m,
        | CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mth
        |FROM orders""".stripMargin,
    "q10_payload_extract" ->
      """SELECT CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT) % 10 AS k_mod,
        | count(*) AS n, min(CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT)) AS k_min,
        | max(CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT)) AS k_max
        |FROM events GROUP BY 1""".stripMargin,
    "q11_cdc_latest_event" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_type, value AS last_value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |      FROM events) WHERE rn = 1""".stripMargin,
    "q12_cdc_upsert_fold" ->
      """WITH anc AS (
        |  SELECT user_id, max(event_id) AS a_id,
        |         arg_max(event_type, event_id) AS a_type, arg_max(value, event_id) AS a_value
        |  FROM events WHERE event_type IN ('signup','purchase','error') GROUP BY user_id),
        |upd AS (
        |  SELECT user_id, max(event_id) AS u_id, arg_max(value, event_id) AS u_value
        |  FROM events WHERE event_type IN ('click','view') GROUP BY user_id)
        |SELECT a.user_id, a.a_type AS status,
        |  CASE WHEN u.u_id IS NOT NULL AND u.u_id > a.a_id THEN u.u_value ELSE a.a_value END AS value,
        |  greatest(a.a_id, coalesce(u.u_id, -1)) AS src_event_id
        |FROM anc a LEFT JOIN upd u ON a.user_id = u.user_id
        |WHERE a.a_type <> 'error'""".stripMargin,
    "q13_cdc_tombstone" ->
      """WITH dead AS (
        |  SELECT user_id FROM (
        |    SELECT user_id, arg_max(event_type, event_id) AS a_type
        |    FROM events WHERE event_type IN ('signup','purchase','error') GROUP BY user_id)
        |  WHERE a_type = 'error')
        |SELECT user_id, count(*) AS n_events, max(event_id) AS last_event
        |FROM events WHERE user_id NOT IN (SELECT user_id FROM dead)
        |GROUP BY user_id""".stripMargin,
    "q14_cdc_validate" ->
      """SELECT
        | CAST(sum(CASE WHEN event_type NOT IN ('signup','purchase','error','click','view') THEN 1 ELSE 0 END) AS BIGINT) AS bad_op,
        | CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_value,
        | CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_key,
        | count(*) AS total
        |FROM events""".stripMargin,
    "q15_cdc_schema_drift" ->
      """SELECT CASE WHEN props IS NULL THEN 'v1' ELSE 'v2' END AS schema_v,
        | count(*) AS n, max(event_id) AS max_id
        |FROM (
        | SELECT event_id, user_id, NULL AS props FROM events WHERE event_id < 5000
        | UNION ALL
        | SELECT event_id, user_id, props FROM events WHERE event_id >= 5000)
        |GROUP BY 1""".stripMargin,
    "q16_cdc_lineage" ->
      """SELECT user_id % 8 AS log_partition, count(*) AS n,
        | max(event_id) AS max_off, min(event_id) AS min_off
        |FROM events GROUP BY 1""".stripMargin,
    "q17_cdc_bucket_prune" ->
      """SELECT user_id, count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM events WHERE user_id % 16 = 3 GROUP BY user_id""".stripMargin)
}
