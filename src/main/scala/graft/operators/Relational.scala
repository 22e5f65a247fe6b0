package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The ad-hoc OLAP layer over the landed firehose + TPC-H-ish tables.
  *
  * Determinism notes (these queries are hash-compared against a DuckDB
  * oracle): every floating-point SUM goes through an exact DECIMAL
  * accumulator and is cast to DOUBLE at the end, so results are independent
  * of partitioning / aggregation order; AVGs are a single exact-sum / count
  * division. Scale notes: dimension joins are `broadcast()`; everything else
  * is a plain shuffled hash/sort-merge join Catalyst + AQE can re-plan.
  */
object Relational {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables(spark, dir, name)

  /** TPC-H Q1-style pricing summary: multi-key group agg with exact sums. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val l = t(spark, dir, "lineitem").filter(col("l_shipdate") <= lit("1998-09-02"))
    val discPrice = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val charge = discPrice * (lit(1.0) + col("l_tax"))
    l.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
        sum(discPrice.cast("decimal(18,4)")).cast("double").as("sum_disc_price"),
        sum(charge.cast("decimal(18,6)")).cast("double").as("sum_charge"),
        (sum(col("l_quantity").cast("decimal(18,2)")).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double") / count(lit(1))).as("avg_price"),
        (sum(col("l_discount").cast("decimal(18,2)")).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** TPC-H Q3-style shipping priority: selective dim filter, 3-way join,
    * group agg, deterministic top-10.
    */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cut = lit("1998-01-01")
    val c = t(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = t(spark, dir, "orders").filter(col("o_orderdate") < cut)
    val l = t(spark, dir, "lineitem").filter(col("l_shipdate") > cut)
    broadcast(c)
      .join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("order_date"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,4)"))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style supplier-nation volume: star join with broadcast dims. */
  def q5SupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val r = t(spark, dir, "region").filter(col("r_name") === "ASIA")
    val n = t(spark, dir, "nation")
    val s = t(spark, dir, "supplier")
    val o = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01"))
    val l = t(spark, dir, "lineitem")
    val c = t(spark, dir, "customer")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,4)"))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Hierarchical aggregation: ROLLUP(nation, market segment). */
  def qRollup(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val n = t(spark, dir, "nation")
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .rollup(col("n_name"), col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_customers"),
        sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("sum_acctbal"),
        grouping_id().cast("int").as("grp"))
      .orderBy(col("grp"), col("n_name"), col("c_mktsegment"))
  }

  /** Range (band) join: orders classified into price bands via a non-equi
    * interval join. The band dimension is tiny, so the right plan is a
    * broadcast nested-loop join (each row probes 5 intervals); for uniform
    * bands an O(1) `floor((x-lo)/width)` classification would avoid even
    * that, but interval dims are generally irregular — this is the general
    * form.
    */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bands = Seq(
      (1, 0.0, 100000.0), (2, 100000.0, 200000.0), (3, 200000.0, 300000.0),
      (4, 300000.0, 400000.0), (5, 400000.0, 1000000000.0))
      .toDF("band_id", "lo", "hi")
    val o = t(spark, dir, "orders")
    o.join(
        broadcast(bands),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy(col("band_id"), col("lo"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
      .select(col("band_id"), col("n_orders"), col("sum_price"))
      .orderBy(col("band_id"))
  }

  /** Pivoted aggregation with a fixed column list (deterministic schema;
    * the oracle expresses the same thing with CASE aggregation).
    */
  def qPivot(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    o.groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"))
      .withColumnRenamed("F", "sum_f")
      .withColumnRenamed("O", "sum_o")
      .withColumnRenamed("P", "sum_p")
      .orderBy(col("o_orderpriority"))
  }

  /** Set operations: EXCEPT / INTERSECT / UNION with distinct semantics. */
  def qSetOps(spark: SparkSession, dir: String): DataFrame = {
    val building = t(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val withOrders = t(spark, dir, "orders").select(col("o_custkey").as("c_custkey")).distinct()
    val exceptSet = building.except(withOrders)
      .withColumn("op", lit("building_no_orders"))
    val intersectSet = building.intersect(withOrders)
      .withColumn("op", lit("building_with_orders"))
    exceptSet.unionByName(intersectSet)
  }

  /** Full grouping-set lattice: CUBE(nation, market segment). */
  def qCube(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val n = t(spark, dir, "nation")
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .cube(col("n_name"), col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_customers"),
        sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("sum_acctbal"),
        grouping_id().cast("int").as("grp"))
  }

  /** Running per-customer spend + order sequence (window functions). */
  def qWindowRunning(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val w = Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    o.select(
      col("o_orderkey"),
      col("o_custkey"),
      col("o_orderdate").cast("date").as("order_date"),
      sum(col("o_totalprice").cast("decimal(18,2)"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double").as("running_spend"),
      row_number().over(w).cast("long").as("order_seq"))
  }

  /** Deterministic top-k rows per group (window rank + filter). */
  def qTopkPerGroup(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val o = t(spark, dir, "orders")
    val w = Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.select(
        col("o_custkey"),
        col("o_orderkey"),
        col("o_totalprice"),
        row_number().over(w).cast("long").as("rnk"))
      .filter(col("rnk") <= k)
  }

  /** As-of join on the event stream: each purchase matched to the same
    * user's most recent prior click. Oracle: DuckDB `ASOF LEFT JOIN`.
    */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    // µs-truncated event time: the nanos in the parquet exceed both DuckDB's
    // and Spark's timestamp precision, so the engine contract is µs.
    val e = Firehose.eventsRaw(spark, dir).withColumn("ts", expr("ts div 1000"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    AsOf.backward(
        purchases, clicks,
        partCols = Seq("user_id"), tsCol = "ts",
        rightCols = Seq("event_id", "value"), prefix = "click_")
      .select(
        col("event_id"), col("user_id"), col("ts").as("ts_us"), col("value"),
        col("click_event_id"), col("click_ts").as("click_ts_us"),
        col("click_value"),
        (col("ts") - col("click_ts")).as("gap_us"))
  }

  /** Forward as-of join: each click matched to the same user's next
    * purchase at-or-after it (conversion attribution). Oracle: DuckDB
    * `ASOF LEFT JOIN ... ON p.ts <= c.ts`.
    */
  def qAsofForward(spark: SparkSession, dir: String): DataFrame = {
    val e = Firehose.eventsRaw(spark, dir).withColumn("ts", expr("ts div 1000"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    AsOf.forward(
        clicks, purchases,
        partCols = Seq("user_id"), tsCol = "ts",
        rightCols = Seq("event_id", "value"), prefix = "next_")
      .select(
        col("event_id"), col("user_id"), col("ts").as("ts_us"), col("value"),
        col("next_event_id"), col("next_ts").as("next_ts_us"),
        col("next_value"),
        (col("next_ts") - col("ts")).as("gap_us"))
  }

  /** Left-semi + left-anti in one result: customer order-activity status. */
  def qSemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders").select(col("o_custkey"))
    val withOrders = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), lit("with_orders").as("status"))
    val withoutOrders = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), lit("without_orders").as("status"))
    withOrders.unionByName(withoutOrders)
  }

  /** Exact distinct aggregation (oracle-checked); the approximate HLL twin is
    * asserted against this in the ScalaTest spec (error bound), since an
    * approximate result can't hash-match a DuckDB oracle.
    */
  def qDistinct(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    o.groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("n_custs"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  /** Per-group top-k through graft's native heap-based physical operator
    * ([[org.apache.spark.sql.graft.TopKPerKeyExec]]): no partition sort,
    * O(n log k), memory bounded by keys×k. Same result set as
    * [[qTopkPerGroup]] minus the rank column.
    */
  def qTopkNative(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.graft.GraftOps
    val o = t(spark, dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    GraftOps.topKPerKey(
      o,
      keys = Seq("o_custkey"),
      orderBy = Seq("o_totalprice" -> true, "o_orderkey" -> false),
      k = k)
  }

  /** Gap-based sessionization of the event stream: the canonical
    * window-function formulation (new-session flag via `lag`, session id via
    * running sum) — one shuffle by user, no iterative driver logic, scales
    * with per-user event counts like any window aggregation.
    */
  def qSessionize(spark: SparkSession, dir: String, gapSec: Long = 1800): DataFrame = {
    val e = Firehose.eventsRaw(spark, dir).withColumn("ts_us", expr("ts div 1000"))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
    val runs = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.select(col("user_id"), col("ts_us"), col("value"))
      .withColumn(
        "new_session",
        when(
          lag(col("ts_us"), 1).over(byUser).isNull ||
            col("ts_us") - lag(col("ts_us"), 1).over(byUser) > gapSec * 1000000L,
          lit(1L)).otherwise(lit(0L)))
      .withColumn("session_id", sum(col("new_session")).over(runs))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
  }

  /** Exact interpolated percentiles per group (`percentile` ≡ DuckDB
    * `quantile_cont`): single-pass grouped aggregation.
    */
  def qPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    o.groupBy(col("o_orderpriority"))
      .agg(
        round(percentile(col("o_totalprice"), lit(0.25)), 4).as("p25"),
        round(percentile(col("o_totalprice"), lit(0.5)), 4).as("p50"),
        round(percentile(col("o_totalprice"), lit(0.75)), 4).as("p75"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q4-style order-priority check: orders in a quarter with at least
    * one late lineitem (shipped >90 days after the order date; the synthetic
    * lineitem has no commit/receipt dates) — EXISTS becomes a left-semi
    * join, then a tiny group-agg. The semi join ships only order keys and
    * the two date columns.
    */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-07-01") && col("o_orderdate") < lit("1996-10-01"))
    val l = t(spark, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
    o.join(l,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q6-style revenue forecast: pure scan + filter + single exact sum.
    * The whole query should collapse to one parquet scan with every filter
    * pushed down (spec-asserted) — the canonical pushdown showcase.
    */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "lineitem")
      .filter(
        col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01") &&
          col("l_discount") >= 0.03 && col("l_discount") <= 0.05 &&
          col("l_quantity") < 24)
      .agg(sum((col("l_extendedprice") * col("l_discount")).cast("decimal(18,4)"))
        .cast("double").as("revenue"))
  }

  /** Correlated scalar subquery, decorrelated: orders strictly above their
    * customer's average order value. The subquery becomes one grouped
    * aggregation joined back on the correlation key — no per-row re-execution,
    * one shuffle on o_custkey shared by both sides.
    */
  def qCorrelatedAboveAvg(spark: SparkSession, dir: String): DataFrame = {
    // window decorrelation, not groupBy+join-back: the per-customer average
    // rides the single orders exchange (the join-back shape scanned orders
    // twice — column pruning gives the two instances different ReadSchemas,
    // so ReuseExchange can't dedupe them — and its "dimension" side is
    // customer-cardinality, never broadcastable at scale)
    val byCust = Window.partitionBy(col("o_custkey"))
    t(spark, dir, "orders")
      .withColumn(
        "cust_avg",
        sum(col("o_totalprice").cast("decimal(18,2)")).over(byCust).cast("double")
          / count(lit(1)).over(byCust))
      .filter(col("o_totalprice") > col("cust_avg"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("cust_avg"))
  }

  /** Fixed-width histogram of order values: O(1) bucket classification
    * (no join at all — contrast with [[qRangeJoin]]'s general interval dim).
    */
  def qHistogram(spark: SparkSession, dir: String, width: Double = 50000.0): DataFrame = {
    val o = t(spark, dir, "orders")
    o.groupBy(floor(col("o_totalprice") / lit(width)).as("bucket"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
      .orderBy(col("bucket"))
  }

  /** Deterministic list/string aggregation: collect_set sorted before
    * joining, so the result is independent of arrival order (a bare
    * collect_list is not reproducible across partitionings).
    */
  def qStringAgg(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val n = t(spark, dir, "nation")
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        array_join(array_sort(collect_set(col("n_name"))), ",").as("nations"),
        count_distinct(col("n_name")).as("n_nations"))
      .orderBy(col("c_mktsegment"))
  }

  /** Conditional aggregates: count_if / any / every (SQL FILTER-clause
    * semantics) in one grouped pass.
    */
  def qConditionalAgg(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    o.groupBy(col("o_orderpriority"))
      .agg(
        count_if(col("o_totalprice") > 200000).as("n_big"),
        count_if(col("o_orderstatus") === "F").as("n_f"),
        some(col("o_totalprice") > 400000).as("any_huge"),
        every(col("o_totalprice") > 1000).as("all_over_1k"))
      .orderBy(col("o_orderpriority"))
  }

  /** Unpivot (melt) — the inverse of [[qPivot]]: the wide per-status sums
    * back to (priority, status, total) rows. Null cells are dropped on both
    * engines explicitly (their default null handling differs).
    */
  def qUnpivot(spark: SparkSession, dir: String): DataFrame = {
    qPivot(spark, dir)
      .unpivot(
        ids = Array(col("o_orderpriority")),
        values = Array(col("sum_f"), col("sum_o"), col("sum_p")),
        variableColumnName = "status",
        valueColumnName = "total")
      .filter(col("total").isNotNull)
  }

  /** Explicit GROUPING SETS — the irregular lattice rollup/cube can't
    * express: per-nation totals and per-segment totals, no cross terms.
    */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "customer").createOrReplaceTempView("g_customer")
    t(spark, dir, "nation").createOrReplaceTempView("g_nation")
    spark.sql(
      """SELECT n_name, c_mktsegment, count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal,
        |  CAST(grouping_id(n_name, c_mktsegment) AS INT) AS grp
        |FROM g_customer JOIN g_nation ON c_nationkey = n_nationkey
        |GROUP BY GROUPING SETS ((n_name), (c_mktsegment))""".stripMargin)
  }

  /** Top-k series per metric name by latest gauge value — the firehose
    * "hottest series" panel, composing the gauge aggregation with graft's
    * native heap-based top-k physical operator.
    */
  def mTopkSeries(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.graft.GraftOps
    val gauges = Firehose.gaugeLatest(Firehose.metricsFromEvents(spark, dir))
    GraftOps.topKPerKey(
      gauges.select("name", "series", "last_value", "last_ts"),
      keys = Seq("name"),
      orderBy = Seq("last_value" -> true, "series" -> false),
      k = k)
  }

  /** TPC-H Q13 shape (customer order-count distribution): LEFT OUTER join
    * with the priority exclusion in the ON clause — not a WHERE — so
    * customers with zero qualifying orders survive with count 0, then a
    * second aggregation over the count histogram. Scale: the first agg is
    * partial by custkey over the join's shuffle; the second's key space is
    * tiny (distinct order counts) and coalesces under AQE.
    */
  def q13CustDist(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer").select(col("c_custkey"))
    val o = t(spark, dir, "orders")
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_custkey"), col("o_orderkey"))
    c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q18 shape (large-volume orders): HAVING on an aggregate (orders
    * whose line quantities sum past a threshold), joined back to orders and
    * customers, deterministic top-100. Scale: the HAVING aggregation is
    * partial by orderkey (the same key the lineitem join needs — one
    * shuffle feeds both); the customer join side is the HAVING output
    * (tiny), which AQE broadcasts at runtime — customer itself grows with
    * SF, so no static hint; top-100 is a TakeOrdered — no global sort.
    */
  def q18LargeOrders(spark: SparkSession, dir: String, minQty: Double = 300.0): DataFrame = {
    val big = t(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("total_qty"))
      .filter(col("total_qty") > minQty)
    // no broadcast hint on customer: it grows with SF (150k rows × SF), so
    // the planner/AQE must keep the size decision — the HAVING output is
    // tiny and AQE broadcasts THAT side of the customer join at runtime
    t(spark, dir, "orders")
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(t(spark, dir, "customer"), col("c_custkey") === col("o_custkey"))
      .select(
        col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("order_date"),
        col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q22 shape (dormant high-value customers): a global scalar
    * subquery (average positive balance) gating a filter, a null-safe anti
    * join against big-spender custkeys, then per-nation aggregation. Scale:
    * the scalar aggregate is a one-row broadcast; the anti join ships only
    * custkeys; one final tiny aggregation.
    */
  def q22DormantValue(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val avgBal = c.filter(col("c_acctbal") > 0)
      .agg((sum(col("c_acctbal").cast("decimal(18,2)")).cast("double") / count(lit(1)))
        .as("_avg_bal"))
    val pricey = t(spark, dir, "orders")
      .filter(col("o_totalprice") > 300000)
      .select(col("o_custkey"))
    c.filter(col("c_nationkey").isin(1, 2, 3))
      .join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("_avg_bal"))
      .join(pricey, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(
        count(lit(1)).as("numcust"),
        sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("totacctbal"))
      .orderBy(col("c_nationkey"))
  }

  /** Full-outer join with both null directions live: BUILDING customers
    * without orders (null right) and order activity from non-BUILDING
    * customers (null left).
    */
  def qFullOuter(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_name"))
    val o = t(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("spend"))
    c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_name"), col("n_orders"), col("spend"))
  }

  /** NOT IN with a subquery — the null-aware anti join (distinct from the
    * plain left-anti of [[qSemiAnti]]: a single NULL in the subquery result
    * legally empties the output). Expressed through the SQL surface.
    */
  def qNotInNullAware(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "customer").createOrReplaceTempView("g_customer")
    t(spark, dir, "orders").createOrReplaceTempView("g_orders")
    spark.sql(
      """SELECT c_custkey, c_mktsegment FROM g_customer
        |WHERE c_custkey NOT IN
        |  (SELECT o_custkey FROM g_orders WHERE o_totalprice > 300000)""".stripMargin)
  }

  /** Event-time RANGE window frame: per-user rolling 1-hour sum — peers at
    * the same timestamp share a frame, so the result is deterministic even
    * under within-timestamp ties (unlike a ROWS frame).
    */
  def qWindowRange(spark: SparkSession, dir: String): DataFrame = {
    val e = Firehose.eventsRaw(spark, dir).withColumn("ts_us", expr("ts div 1000"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-3600L * 1000000L, 0L)
    e.select(
      col("event_id"), col("user_id"), col("ts_us"),
      sum(col("value").cast("decimal(18,2)")).over(w).cast("double").as("rolling_1h"),
      count(lit(1)).over(w).as("n_in_window"))
  }

  /** TPC-H Q14 shape — promotion revenue share: a fact-dimension join where
    * the aggregate is a RATIO of two conditional sums over the same rows
    * (one grouped pass, no second scan). The part side broadcasts; the
    * shipdate filter is pushed to the fact scan. Both sums are exact
    * decimal accumulators; the ratio is one double division at the end.
    */
  def q14PromoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val l = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1996-04-01"))
    val p = t(spark, dir, "part").select(col("p_partkey"), col("p_type"))
    val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,6)")
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(
        (lit(100.0) *
          sum(when(col("p_type") === "PROMO", rev).otherwise(lit(BigDecimal(0)).cast("decimal(18,6)")))
            .cast("double") /
          sum(rev).cast("double")).as("promo_share"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q16 shape — supplier variety per part segment: COUNT(DISTINCT)
    * under a NOT IN exclusion subquery. The blacklist (suppliers in the
    * red) is dimension-sized → broadcast null-aware anti join; the distinct
    * count is a two-level aggregation (dedup partial-aggregates map-side
    * before the final count), never a corpus-wide distinct sort.
    */
  def q16SupplierVariety(spark: SparkSession, dir: String): DataFrame = {
    val l = t(spark, dir, "lineitem").select(col("l_partkey"), col("l_suppkey"))
    val p = t(spark, dir, "part")
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val bad = t(spark, dir, "supplier").filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    l.join(bad, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(count_distinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** TPC-H Q19 shape — disjunctive multi-attribute join predicate (OR of
    * brand/size/quantity conjunctions). The equi-key (partkey) still drives
    * a broadcast hash join; the OR-of-ANDs residual evaluates post-probe
    * inside the same codegen stage — the shape that degrades to a cartesian
    * product if the planner can't split the equi-conjunct out.
    */
  def q19DisjunctivePredicate(spark: SparkSession, dir: String): DataFrame = {
    val l = t(spark, dir, "lineitem")
    val p = t(spark, dir, "part").select(col("p_partkey"), col("p_brand"), col("p_size"))
    val clause =
      (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
        col("l_quantity").between(1, 20)) ||
      (col("p_brand") === "Brand#2" && col("p_size").between(1, 20) &&
        col("l_quantity").between(10, 30)) ||
      (col("p_brand") === "Brand#3" && col("p_size").between(1, 30) &&
        col("l_quantity").between(20, 40))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey") && clause)
      .agg(
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,6)"))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q7 shape — bilateral nation trade volume: a two-fact-hop join
    * (lineitem→orders→customer plus lineitem→supplier) where BOTH ends are
    * decorated from the same broadcast dimension (nation, aliased twice)
    * and the filter is a symmetric nation-pair disjunction. Grouped by
    * (supplier nation, customer nation, ship year); exact decimal revenue.
    */
  def q7NationVolume(spark: SparkSession, dir: String): DataFrame = {
    val n1 = t(spark, dir, "nation")
      .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
    val n2 = t(spark, dir, "nation")
      .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
    val l = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1998-01-01"))
    val pair =
      (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
      (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1")
    l.join(t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(spark, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
      .filter(pair)
      // DuckDB's year() is BIGINT, Spark's INT — cast so schemas agree
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,6)"))
        .cast("double").as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** TPC-H Q15 shape — top supplier by revenue view: the per-supplier
    * revenue aggregate is consumed TWICE (once for the global max scalar
    * subquery, once joined back to supplier rows), the classic
    * shared-subplan + argmax-with-ties pattern. The revenue relation is
    * supplier-bounded → materialized once ([[graft.Tables.materializeSmall]])
    * so the corpus-scale fact scan runs once, not twice.
    */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val revenue = graft.Tables.materializeSmall(
      t(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1996-04-01"))
        .groupBy(col("l_suppkey"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,6)"))
          .cast("double").as("total_revenue")))
    val best = revenue.agg(max(col("total_revenue")).as("_max_rev"))
    t(spark, dir, "supplier")
      .join(revenue, col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(best))
      .filter(col("total_revenue") === col("_max_rev"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q20 shape — nested IN chain: suppliers IN (big movers of parts
    * IN (a part-attribute subset)), with the inner membership computed by
    * a HAVING threshold on a grouped aggregate. Decorrelates to two
    * stacked left-semi joins; the part subset broadcasts, the supplier
    * aggregate is map-side combinable.
    */
  def q20BigMovers(spark: SparkSession, dir: String, minQty: Double = 500.0): DataFrame = {
    val promoParts = t(spark, dir, "part")
      .filter(col("p_type") === "PROMO").select(col("p_partkey"))
    val movers = t(spark, dir, "lineitem")
      .join(broadcast(promoParts), col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
      .filter(col("qty") > minQty)
      .select(col("l_suppkey"))
    t(spark, dir, "supplier")
      .join(movers, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q10 shape — returned-item ranking: fact→fact→dim join chain
    * filtered on both fact sides (return flag on lineitem, date range on
    * orders), grouped by customer, deterministic top-20 by revenue with a
    * key tie-break. The limit plans as TakeOrdered (per-partition heaps +
    * one driver merge of 20-row arrays) — no global sort at any scale.
    */
  def q10ReturnedRank(spark: SparkSession, dir: String): DataFrame = {
    val l = t(spark, dir, "lineitem").filter(col("l_returnflag") === "R")
    val o = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1997-01-01"))
      .select(col("o_orderkey"), col("o_custkey"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .agg(
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,6)"))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q11 shape — share-of-global HAVING: a grouped aggregate compared
    * against a scalar derived from the SAME aggregate (parts whose revenue
    * exceeds a fraction of total revenue). The per-part relation is
    * key-bounded → materialized once so the corpus-scale fact scan runs
    * once; the one-row total broadcasts back. Exact decimal sums, the
    * share test in IEEE doubles on both engines.
    */
  def q11ValueShare(spark: SparkSession, dir: String, fraction: Double = 0.0007): DataFrame = {
    val pv = graft.Tables.materializeSmall(
      t(spark, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,6)"))
          .as("_val_dec")))
    val tot = pv.agg(sum(col("_val_dec")).as("_total_dec"))
    pv.join(broadcast(tot))
      .filter(col("_val_dec").cast("double") > lit(fraction) * col("_total_dec").cast("double"))
      .select(col("l_partkey"), col("_val_dec").cast("double").as("part_value"))
      .orderBy(col("part_value").desc, col("l_partkey"))
  }

  /** TPC-H Q17 shape — correlated scalar-aggregate predicate: lineitems of
    * a small part subset kept only when their quantity is under 20% of
    * that part's OWN average quantity. Decorrelates to a per-part average
    * (map-side combinable, keyed by the probed parts only via a broadcast
    * semi-join) joined back to the fact rows; the average is a
    * decimal-sum / count so the threshold is bit-deterministic.
    */
  def q17SmallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    // one lineitem scan: semi-join down to the selective brand's rows, then
    // the per-part average as a window over the SAME relation (the
    // groupBy+broadcast-join-back shape scanned lineitem twice; the window
    // shuffles only the brand-filtered slice by part key)
    val parts = t(spark, dir, "part")
      .filter(col("p_brand") === "Brand#1" && col("p_size") <= 5)
      .select(col("p_partkey"))
    val byPart = Window.partitionBy(col("l_partkey"))
    t(spark, dir, "lineitem")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"), "left_semi")
      .withColumn(
        "_avg_qty",
        sum(col("l_quantity").cast("decimal(18,2)")).over(byPart).cast("double")
          / count(lit(1)).over(byPart))
      .filter(col("l_quantity") < lit(0.2) * col("_avg_qty"))
      .agg(
        (sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double") / lit(7.0))
          .as("avg_yearly"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q21 shape — EXISTS + NOT EXISTS self-joins: suppliers who were
    * the ONLY late shipper in a multi-supplier order ("late" = shipped
    * > 180 days after the order date). Decorrelated Spark-first: one
    * (order, supplier) aggregate, then order-level counts as window sums
    * over the SAME shuffled relation (no self-scan of the fact), so the
    * lineitem table is read once where the literal EXISTS form reads it
    * three times. The oracle runs the EXISTS/NOT-EXISTS form — identical
    * results prove the decorrelation. Deterministic top-100 by wait count
    * with supplier-key tie-break.
    */
  def q21LoneLateSupplier(spark: SparkSession, dir: String, lateDays: Int = 180): DataFrame = {
    val perSupp = t(spark, dir, "lineitem")
      .join(t(spark, dir, "orders").select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(
        (datediff(col("l_shipdate"), col("o_orderdate")) > lateDays).cast("int"))
        .as("_late"))
    val wo = Window.partitionBy(col("l_orderkey"))
    val lone = perSupp
      .withColumn("_n_supp", count(lit(1)).over(wo))
      .withColumn("_n_late", sum(col("_late")).over(wo))
      .filter(col("_late") === 1 && col("_n_supp") > 1 && col("_n_late") === 1)
    lone
      .join(broadcast(t(spark, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey"))
      .limit(100)
  }

  /** ANALYZE-style table profile — the stats-collection pass every pipeline
    * runs before planning a big job: per column, row/null/distinct counts
    * and typed min/max (numeric and string kept in separate typed columns —
    * rendering doubles to text is engine-specific and would break the
    * oracle). One full scan + one aggregation; the multiple exact
    * COUNT(DISTINCT)s expand the input ×cols in that single pass, which is
    * the exact-profile cost model — at 100 TB on a wide table, swap
    * `count_distinct` for `approx_count_distinct` (one pass, no expand,
    * mergeable HLL sketches) and keep everything else.
    */
  def tableProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = df.schema
    def isNum(c: String) = schema(c).dataType.isInstanceOf[NumericType]
    def isStr(c: String) = schema(c).dataType == StringType
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__cnt"),
        count_distinct(col(c)).as(s"${c}__nd"),
        (if (isNum(c)) min(col(c)).cast("double") else lit(null).cast("double"))
          .as(s"${c}__minn"),
        (if (isNum(c)) max(col(c)).cast("double") else lit(null).cast("double"))
          .as(s"${c}__maxn"),
        (if (isStr(c)) min(col(c)) else lit(null).cast("string")).as(s"${c}__mins"),
        (if (isStr(c)) max(col(c)) else lit(null).cast("string")).as(s"${c}__maxs"))
    } :+ count(lit(1)).as("__total")
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map { c =>
        struct(
          lit(c).as("col_name"),
          col("__total").as("n_rows"),
          (col("__total") - col(s"${c}__cnt")).as("n_nulls"),
          col(s"${c}__nd").as("n_distinct"),
          col(s"${c}__minn").as("min_num"),
          col(s"${c}__maxn").as("max_num"),
          col(s"${c}__mins").as("min_str"),
          col(s"${c}__maxs").as("max_str"))
      }: _*)).as("p"))
      .select("p.*")
      .orderBy("col_name")
  }

  /** Data-quality expectation suite — the constraint-check pass a
    * production pipeline runs before publishing a table (the Deequ/
    * Great-Expectations shape): each check emits its violation count and a
    * pass flag, so the output is both a gate (all passed = publish) and a
    * diagnostic (which constraint broke, by how much). Checks: non-empty
    * table, composite-primary-key uniqueness, numeric range, categorical
    * domain, non-null, positivity, and referential integrity to a parent
    * table.
    *
    * Scale shape: every single-table check folds into ONE aggregation over
    * ONE fact scan (conditional sums are map-side-combinable; the
    * composite-key uniqueness rides the same pass as a count-distinct over
    * `orderkey*100 + linenumber` — exact in int64 since linenumber < 100,
    * and portable where a multi-column DISTINCT is not). Referential
    * integrity is the only second pass: an anti-join against the parent
    * keys, key columns pruned to the scan on both sides. The one-row
    * metric vectors cross-join (1×1) and unpivot driver-free.
    */
  def p3Expectations(spark: SparkSession, dir: String): DataFrame =
    expectationSuite(t(spark, dir, "lineitem"), t(spark, dir, "orders"))

  /** See [[p3Expectations]]; split out so specs can plant violations. */
  def expectationSuite(li: DataFrame, ord: DataFrame): DataFrame = {
    val base = li.agg(
      count(lit(1)).as("n_rows"),
      (count(lit(1)) -
        count_distinct(col("l_orderkey") * 100 + col("l_linenumber"))).as("dup_keys"),
      sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L).otherwise(0L))
        .as("qty_range"),
      sum(when(!col("l_returnflag").isin("A", "N", "R"), 1L).otherwise(0L))
        .as("flag_domain"),
      sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)).as("null_shipdate"),
      sum(when(col("l_extendedprice") <= 0, 1L).otherwise(0L)).as("price_pos"))
    val orphans = li.select(col("l_orderkey"))
      .join(
        ord.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("orphan_rows"))
    def chk(name: String, v: Column) =
      struct(lit(name).as("check_name"), v.cast("long").as("violations"))
    base.crossJoin(orphans)
      .select(explode(array(
        chk("dup_primary_key", col("dup_keys")),
        chk("empty_table", when(col("n_rows") === 0, 1L).otherwise(0L)),
        chk("extendedprice_positive", col("price_pos")),
        chk("orderkey_ref_integrity", col("orphan_rows")),
        chk("quantity_in_range", col("qty_range")),
        chk("returnflag_in_domain", col("flag_domain")),
        chk("shipdate_not_null", col("null_shipdate")))).as("c"))
      .select(col("c.check_name"), col("c.violations"))
      .withColumn("passed", when(col("violations") === 0, 1L).otherwise(0L))
      .orderBy("check_name")
  }

  /** Approximate distinct twin of [[qDistinct]] (HLL, spec-verified). */
  def qDistinctApprox(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    o.groupBy(col("o_orderpriority"))
      .agg(approx_count_distinct(col("o_custkey"), 0.02).as("n_custs_approx"))
  }

  /** Approximate twin of [[qPercentiles]]: `approx_percentile` (the
    * Greenwald-Khanna sketch) with a bounded relative accuracy. The sketch
    * is mergeable, so at 100 TB this is one map-side-combinable pass —
    * unlike exact `percentile`, whose state is the value multiset.
    * Spec-verified within the accuracy bound of the exact operator
    * (approximate ⇒ no hash oracle, the same policy as the HLL twin).
    */
  def qPercentilesApprox(spark: SparkSession, dir: String, accuracy: Int = 10000): DataFrame = {
    val o = t(spark, dir, "orders")
    o.groupBy(col("o_orderpriority"))
      .agg(
        approx_percentile(col("o_totalprice"), lit(0.25), lit(accuracy)).as("p25_approx"),
        approx_percentile(col("o_totalprice"), lit(0.5), lit(accuracy)).as("p50_approx"),
        approx_percentile(col("o_totalprice"), lit(0.75), lit(accuracy)).as("p75_approx"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))
  }

  /** Ranking-function family over one window — ntile quartiles,
    * percent_rank, cume_dist, and lag/lead neighbors per order-priority
    * partition, all sharing ONE window partitioning (one exchange, one
    * sort). Every rank output is a ratio of integers (deterministic with
    * the unique-key tie-break); the point is the breadth of the window
    * surface on a single shuffle, not the individual functions.
    */
  def qWindowRanks(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
  }

  /** SCD type-2 interval build — turn a change-event stream into temporal
    * dimension rows: consecutive same-state events per entity collapse to
    * one row with `[valid_from, valid_to)` bounds, `valid_to` = the next
    * state's start (NULL on the open, current row). The run detection is
    * a change flag + running sum over ONE window partitioning by entity —
    * the grouping and both windows (run id, lead) share that single
    * shuffle, so at 100 TB the operator costs one exchange by user key.
    * Timestamps flow as integer microseconds (the engine-portable form).
    */
  def qScd2Intervals(spark: SparkSession, dir: String): DataFrame = {
    val e = Firehose.eventsRaw(spark, dir).withColumn("ts_us", expr("ts div 1000"))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val runs = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val byRun = Window.partitionBy(col("user_id")).orderBy(col("run_id"))
    e.select(col("user_id"), col("event_id"), col("event_type"), col("ts_us"))
      .withColumn(
        "_chg",
        when(
          lag(col("event_type"), 1).over(byUser).isNull ||
            lag(col("event_type"), 1).over(byUser) =!= col("event_type"),
          lit(1L)).otherwise(lit(0L)))
      .withColumn("run_id", sum(col("_chg")).over(runs))
      .groupBy(col("user_id"), col("run_id"), col("event_type"))
      .agg(
        min(col("ts_us")).as("valid_from_us"),
        count(lit(1)).as("n_events"))
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(byRun))
      .select(
        col("user_id"), col("run_id"), col("event_type").as("state"),
        col("valid_from_us"), col("valid_to_us"),
        col("valid_to_us").isNull.as("is_current"), col("n_events"))
  }

  /** TPC-H Q2 shape — min-cost supplier: for each part of a given size/type,
    * the supplier(s) in one region offering it at the minimum observed unit
    * price (this schema has no partsupp, so unit cost = min shipped
    * `l_extendedprice / l_quantity` per (part, supplier) — an
    * order-independent double MIN, hash-stable across engines). The
    * correlated `cost = (SELECT min ...)` of the literal form decorrelates
    * to one window-min over the SAME shuffled (part, supplier) relation —
    * the fact table is scanned once, not per-part. Region dims broadcast;
    * at 100 TB the only shuffle is the (part, supplier) aggregate.
    */
  def q2MinCostSupplier(spark: SparkSession, dir: String, region: String = "EUROPE",
      pType: String = "SMALL", pSize: Int = 10): DataFrame = {
    val parts = t(spark, dir, "part")
      .filter(col("p_type") === pType && col("p_size") === pSize)
      .select(col("p_partkey"), col("p_brand"))
    val regionSupp = t(spark, dir, "supplier")
      .join(broadcast(t(spark, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(spark, dir, "region").filter(col("r_name") === region)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val cost = t(spark, dir, "lineitem")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
    val wp = Window.partitionBy(col("l_partkey"))
    cost
      .join(broadcast(regionSupp), col("l_suppkey") === col("s_suppkey"))
      .withColumn("_min_cost", min(col("unit_cost")).over(wp))
      .filter(col("unit_cost") === col("_min_cost"))
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("l_partkey").as("p_partkey"), col("p_brand"), col("unit_cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  /** TPC-H Q8 shape — national market share: of all order volume shipped
    * into one region's customers for one part type, the fraction supplied
    * by one nation, per order year. The share is a ratio of two
    * conditional DECIMAL sums computed in ONE grouped pass (no second
    * scan, no join-back); dims broadcast; the single shuffle is the
    * per-year aggregate whose key count is the number of years.
    */
  def q8MarketShare(spark: SparkSession, dir: String, region: String = "ASIA",
      nation: String = "NATION_2", pType: String = "ECONOMY"): DataFrame = {
    val parts = t(spark, dir, "part").filter(col("p_type") === pType).select(col("p_partkey"))
    val custRegion = t(spark, dir, "customer")
      .join(broadcast(t(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(spark, dir, "region").filter(col("r_name") === region)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val suppNation = t(spark, dir, "supplier")
      .join(broadcast(t(spark, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val vol = (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,6)")
    t(spark, dir, "lineitem")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"), "left_semi")
      .join(t(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custRegion), col("o_custkey") === col("c_custkey"), "left_semi")
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        (sum(when(col("supp_nation") === nation, vol).otherwise(lit(0).cast("decimal(18,6)")))
          .cast("double") / sum(vol).cast("double")).as("mkt_share"),
        sum(vol).cast("double").as("total_volume"))
      .orderBy(col("o_year"))
  }

  /** TPC-H Q9 shape — product-type profit by nation and year: profit =
    * revenue minus a retail-price-proportional cost proxy (no partsupp /
    * ps_supplycost in this schema), for parts whose name matches a
    * substring, grouped by supplier nation × order year. The profit
    * amount is one codegen'd double expression cast to DECIMAL before the
    * sum, so the aggregate is order-independent. Part subset + supplier
    * dim broadcast; one shuffle (the group agg, map-side combinable).
    */
  def q9ProductProfit(spark: SparkSession, dir: String, nameLike: String = "%widget%",
      costRate: Double = 0.006): DataFrame = {
    val parts = t(spark, dir, "part")
      .filter(col("p_name").like(nameLike))
      .select(col("p_partkey"), col("p_retailprice"))
    val suppNation = t(spark, dir, "supplier")
      .join(broadcast(t(spark, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    val amount = (col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      - lit(costRate) * col("p_retailprice") * col("l_quantity")).cast("decimal(18,6)")
    t(spark, dir, "lineitem")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(t(spark, dir, "orders").select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(amount).cast("double").as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** TPC-H Q12 shape — shipping-class priority mix: lineitems bucketed by
    * ship lateness class (this schema has no l_shipmode; the class is a
    * CASE over `datediff(shipdate, orderdate)`), counting high- vs
    * low-priority orders per class — the canonical CASE-sum-over-join.
    * The orders side projects two columns before the join; the class
    * expression and both conditional counts are one codegen'd pass over
    * the joined rows; one single shuffle (3-key group agg).
    */
  def q12ShippingClasses(spark: SparkSession, dir: String,
      slowDays: Int = 60, lateDays: Int = 120): DataFrame = {
    val l = t(spark, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
    val o = t(spark, dir, "orders").select(col("o_orderkey"), col("o_orderdate"),
      col("o_orderpriority"))
    val lag = datediff(col("l_shipdate"), col("o_orderdate"))
    val shipClass = when(lag > lateDays, lit("LATE"))
      .when(lag > slowDays, lit("SLOW")).otherwise(lit("FAST"))
    val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(shipClass.as("ship_class"))
      .agg(
        sum(isHigh.cast("long")).as("high_line_count"),
        sum((!isHigh).cast("long")).as("low_line_count"))
      .orderBy(col("ship_class"))
  }
}
