package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Firehose, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 has a `queries` entry, and
  * (where DuckDB can express it) a matching `oracleSql` entry with identical
  * output column names/types.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the reference's whole pipeline in one plan — parse JSON metrics, filter
    * tags, keep latest gauge per series, render Prometheus exposition.
    */
  def entry(spark: SparkSession): DataFrame =
    Firehose.promRender(
      Firehose.gaugeLatest(
        Firehose.metricsFromEvents(spark, "/root/testdata/sf0.001")))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2.1 firehose core ----
    "m1_parse_metrics" -> ((s, dir) =>
      Firehose.metricsFromEvents(s, dir).select(
        col("id"), col("name"), col("timestamp").as("ts_sec"), col("component"),
        col("tags").getItem("user").as("user_tag"),
        col("tags").getItem("unit").as("unit_tag"),
        col("value"),
        col("window.from").as("win_from"),
        col("window.to").as("win_to"),
        col("window.interval").as("win_interval"))),
    "m2_gauge_latest" -> ((s, dir) =>
      Firehose.gaugeLatest(Firehose.metricsFromEvents(s, dir))),
    "m3_tag_filter" -> ((s, dir) =>
      Firehose.tagFilter(Firehose.metricsFromEvents(s, dir))
        .select(col("id"), Firehose.seriesKey(col("labels")).as("series"))),
    "m4_lookup_remap" -> ((s, dir) => {
      val lookup = Tables(s, dir, "customer")
        .select(col("c_custkey").cast("string").as("from"), col("c_name").as("to"))
      Firehose.lookupRemap(
          Firehose.tagFilter(Firehose.metricsFromEvents(s, dir)), "user", lookup)
        .select(col("id"), col("labels").getItem("user").as("user_label"))
    }),
    "m5_window_agg" -> ((s, dir) =>
      Firehose.windowAgg(Firehose.metricsFromEvents(s, dir), 60)),
    "m6_prom_render" -> ((s, dir) =>
      Firehose.promRender(Firehose.gaugeLatest(Firehose.metricsFromEvents(s, dir)))),
    "m7_series_rate" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Firehose.eventsRaw(s, dir).withColumn("ts_us", expr("ts div 1000"))
      val w = Window.partitionBy(col("event_type"), col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      e.select(
        col("event_id"), col("user_id"), col("event_type"), col("ts_us"), col("value"),
        ((col("value") - lag(col("value"), 1).over(w)) /
          ((col("ts_us") - lag(col("ts_us"), 1).over(w)) / lit(1e6))).as("rate"))
    }),
    "m8_gauge_expiry" -> ((s, dir) =>
      Firehose.gaugeExpiry(
        Firehose.gaugeLatest(Firehose.metricsFromEvents(s, dir)),
        ttlSec = 604800)),
    // ---- §2.2 relational / OLAP ----
    "q1_pricing_summary" -> ((s, dir) => Relational.q1PricingSummary(s, dir)),
    "q3_shipping_priority" -> ((s, dir) => Relational.q3ShippingPriority(s, dir)),
    "q5_supplier_volume" -> ((s, dir) => Relational.q5SupplierVolume(s, dir)),
    "q_rollup" -> ((s, dir) => Relational.qRollup(s, dir)),
    "q_window_running" -> ((s, dir) => Relational.qWindowRunning(s, dir)),
    "q_topk_per_group" -> ((s, dir) => Relational.qTopkPerGroup(s, dir)),
    "q_asof_join" -> ((s, dir) => Relational.qAsofJoin(s, dir)),
    "q_semi_anti" -> ((s, dir) => Relational.qSemiAnti(s, dir)),
    "q_distinct" -> ((s, dir) => Relational.qDistinct(s, dir)))

  // DuckDB dialect; column names/types aligned with the Spark results above.
  def oracleSql: Map[String, String] = Map(
    "m1_parse_metrics" ->
      """SELECT CAST(event_id AS VARCHAR) AS id, event_type || '_total' AS name,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec, 'app' AS component,
        |  CAST(user_id AS VARCHAR) AS user_tag, 'bytes' AS unit_tag, value,
        |  CAST(floor(epoch(ts)) AS BIGINT) - 60 AS win_from,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS win_to, 60 AS win_interval
        |FROM events""".stripMargin,
    "m2_gauge_latest" ->
      """WITH m AS (
        |  SELECT 'app' AS component, event_type || '_total' AS name,
        |         'user=' || CAST(user_id AS VARCHAR) AS series, value,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
        |         row_number() OVER (PARTITION BY event_type, user_id
        |           ORDER BY CAST(floor(epoch(ts)) AS BIGINT) DESC,
        |                    CAST(event_id AS VARCHAR) DESC) AS rn
        |  FROM events)
        |SELECT component, name, series, value AS last_value, ts_sec AS last_ts
        |FROM m WHERE rn = 1""".stripMargin,
    "m3_tag_filter" ->
      """SELECT CAST(event_id AS VARCHAR) AS id,
        |  'user=' || CAST(user_id AS VARCHAR) AS series
        |FROM events""".stripMargin,
    "m4_lookup_remap" ->
      """SELECT CAST(e.event_id AS VARCHAR) AS id,
        |  COALESCE(c.c_name, CAST(e.user_id AS VARCHAR)) AS user_label
        |FROM events e LEFT JOIN customer c
        |  ON CAST(e.user_id AS VARCHAR) = CAST(c.c_custkey AS VARCHAR)""".stripMargin,
    "m5_window_agg" ->
      """SELECT 'app' AS component, event_type || '_total' AS name,
        |  (CAST(floor(epoch(ts)) AS BIGINT) // 60) * 60 AS win_start,
        |  count(*) AS n, min(value) AS min_value, max(value) AS max_value,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value
        |FROM events GROUP BY 1, 2, 3""".stripMargin,
    "m6_prom_render" ->
      """WITH m AS (
        |  SELECT event_type, user_id, value,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
        |         row_number() OVER (PARTITION BY event_type, user_id
        |           ORDER BY CAST(floor(epoch(ts)) AS BIGINT) DESC,
        |                    CAST(event_id AS VARCHAR) DESC) AS rn
        |  FROM events)
        |SELECT 'app_' || event_type || '_total{user="' || CAST(user_id AS VARCHAR)
        |  || '"} ' || printf('%.6f', value) || ' ' || CAST(ts_sec * 1000 AS VARCHAR) AS line
        |FROM m WHERE rn = 1""".stripMargin,
    "m7_series_rate" ->
      """SELECT event_id, user_id, event_type, epoch_ns(ts) // 1000 AS ts_us, value,
        |  (value - lag(value) OVER w)
        |    / ((epoch_ns(ts) // 1000 - lag(epoch_ns(ts) // 1000) OVER w) / 1e6) AS rate
        |FROM events
        |WINDOW w AS (PARTITION BY event_type, user_id
        |             ORDER BY epoch_ns(ts) // 1000, event_id)""".stripMargin,
    "m8_gauge_expiry" ->
      """WITH m AS (
        |  SELECT 'app' AS component, event_type || '_total' AS name,
        |         'user=' || CAST(user_id AS VARCHAR) AS series, value,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
        |         row_number() OVER (PARTITION BY event_type, user_id
        |           ORDER BY CAST(floor(epoch(ts)) AS BIGINT) DESC,
        |                    CAST(event_id AS VARCHAR) DESC) AS rn
        |  FROM events),
        |g AS (SELECT component, name, series, value AS last_value, ts_sec AS last_ts
        |      FROM m WHERE rn = 1)
        |SELECT * FROM g
        |WHERE last_ts >= (SELECT max(last_ts) FROM g) - 604800""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/count(*) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/count(*) AS avg_price,
        |  CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)/count(*) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        |  CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-01-01' AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_supplier_volume" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem, orders, customer, supplier, nation, region
        |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |  AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |  AND n_regionkey = r_regionkey AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q_rollup" ->
      """SELECT n_name, c_mktsegment, count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal,
        |  CAST(GROUPING(n_name, c_mktsegment) AS INTEGER) AS grp
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name, c_mktsegment)
        |ORDER BY grp, n_name NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin,
    "q_window_running" ->
      """SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS order_date,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
        |  CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS order_seq
        |FROM orders""".stripMargin,
    "q_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk
        |  FROM orders) t WHERE rnk <= 3""".stripMargin,
    "q_asof_join" ->
      """SELECT p.event_id, p.user_id, epoch_ns(p.ts) // 1000 AS ts_us, p.value,
        |  c.event_id AS click_event_id, epoch_ns(c.ts) // 1000 AS click_ts_us,
        |  c.value AS click_value,
        |  epoch_ns(p.ts) // 1000 - epoch_ns(c.ts) // 1000 AS gap_us
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin,
    "q_semi_anti" ->
      """SELECT c_custkey,
        |  CASE WHEN EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |       THEN 'with_orders' ELSE 'without_orders' END AS status
        |FROM customer""".stripMargin,
    "q_distinct" ->
      """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_custs,
        |  count(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
}
