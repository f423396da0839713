package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** The read-only SELECT surface the reference exposes through
  * `run_select_query` (reference: mcp_clickhouse/mcp_server.py:433-459 —
  * arbitrary ClickHouse SELECT SQL), re-expressed as declarative Spark
  * DataFrame plans so Catalyst handles pushdown / pruning / join
  * planning.
  *
  * Scale notes (100 TB):
  *  - dimension tables (region/nation/supplier) are broadcast-hinted —
  *    they are small at any scale factor;
  *  - every aggregate is a hash aggregate with map-side partial combine;
  *  - money aggregates sum exact integer grid units ([[ExactAgg]]) so
  *    results are independent of partial-aggregation merge order (and
  *    match the DuckDB oracle bit-for-bit on every run).
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** TPC-H Q1-style pricing summary: full-scan grouped aggregation. */
  val q1PricingSummary: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1999-12-31"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"), // integer-valued: double sum is already exact
        ExactAgg.sumExact(col("l_extendedprice"), 100L, 2).as("sum_base_price"),
        ExactAgg.sumExact(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10000L, 4).as("sum_disc_price"),
        ExactAgg.sumExact(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), 1000000L, 6).as("sum_charge"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        ExactAgg.avgExact(col("l_extendedprice"), 100L, 4).as("avg_price"),
        ExactAgg.avgExact(col("l_discount"), 100L, 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q6-style: tight filter + single aggregate; predicates reach
    * the parquet scan (PushedFilters). */
  val q6ForecastRevenue: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01") &&
        col("l_discount").between(0.03, 0.07) &&
        col("l_quantity") < 24)
      .agg(ExactAgg.sumExact(col("l_extendedprice") * col("l_discount"), 10000L, 4).as("revenue"))

  /** TPC-H Q3-style: 3-way join + group + deterministic top-N. */
  val q3ShippingPriority: Q = (s, dir) =>
    t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < lit("1999-01-01"))
      .join(t(s, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > lit("1999-01-01"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(ExactAgg.sumExact(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10000L, 4).as("revenue"))
      .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(20)

  /** TPC-H Q4-style: EXISTS → left-semi join. */
  val q4OrderPriority: Q = (s, dir) => {
    val orders = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1996-07-01"))
    val li = t(s, dir, "lineitem")
    orders
      .join(li, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q5-style: 6-way join; nation/region/supplier broadcast. */
  val q5SupplierVolume: Q = (s, dir) =>
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1998-01-01"))
      .join(t(s, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy("n_name")
      .agg(ExactAgg.sumExact(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10000L, 4).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))

  /** Monthly rollup — ClickHouse toStartOfMonth ≡ date_trunc. */
  val qMonthlyOrders: Q = (s, dir) =>
    t(s, dir, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(count(lit(1)).as("n_orders"),
        ExactAgg.sumExact(col("o_totalprice"), 100L, 2).as("total"))
      .orderBy("month")

  /** Exact distinct counts (ClickHouse uniqExact). */
  val qDistinct: Q = (s, dir) =>
    t(s, dir, "orders")
      .agg(countDistinct(col("o_custkey")).as("n_cust"),
        countDistinct(col("o_orderpriority")).as("n_pri"))

  /** Conditional aggregation — ClickHouse countIf/sumIf/avgIf. */
  val qConditionalAgg: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        count(when(col("l_quantity") > 25, 1)).as("big_qty_cnt"),
        ExactAgg.sumExact(when(col("l_discount") > 0.05, col("l_extendedprice")), 100L, 2).as("discounted_price"),
        round(avg(when(col("l_tax") > 0.04, col("l_quantity"))), 4).as("avg_taxed_qty"))
      .orderBy("l_returnflag")

  /** ClickHouse `ORDER BY ... WITH FILL` — a dense time axis with
    * zero-filled gaps, the time-series shape dashboards expect. The
    * observed day buckets are sparse (only days with a >450k order);
    * the fill axis is generated from the 1-row min/max bounds
    * (broadcast) with `sequence` + explode — the corpus is aggregated
    * once and never re-scanned for the axis, so density costs
    * O(axis length), not O(corpus). */
  val qWithFill: Q = (s, dir) => {
    val sparse = t(s, dir, "orders")
      .filter(col("o_totalprice") > 450000)
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n_big"))
    val axis = sparse
      .agg(min("day").as("lo"), max("day").as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
    axis.join(sparse, Seq("day"), "left")
      .select(col("day"), coalesce(col("n_big"), lit(0L)).as("n_big"))
      .orderBy("day")
  }

  val queries: Map[String, Q] = Map(
    "q_with_fill" -> qWithFill,
    "q1_pricing_summary" -> q1PricingSummary,
    "q6_forecast_revenue" -> q6ForecastRevenue,
    "q3_shipping_priority" -> q3ShippingPriority,
    "q4_order_priority" -> q4OrderPriority,
    "q5_supplier_volume" -> q5SupplierVolume,
    "q_monthly_orders" -> qMonthlyOrders,
    "q_distinct" -> qDistinct,
    "q_conditional_agg" -> qConditionalAgg,
  )

  val oracles: Map[String, String] = Map(
    "q_with_fill" ->
      """WITH sparse AS (
        |  SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
        |    count(*) AS n_big
        |  FROM orders WHERE o_totalprice > 450000 GROUP BY 1),
        |axis AS (
        |  SELECT unnest(generate_series(min(day), max(day),
        |                                INTERVAL 1 DAY)) AS day
        |  FROM sparse)
        |SELECT axis.day, CAST(coalesce(n_big, 0) AS BIGINT) AS n_big
        |FROM axis LEFT JOIN sparse ON axis.day = sparse.day
        |ORDER BY axis.day""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) / 100.0, 2) AS sum_base_price,
        |  round(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000.0) AS BIGINT)) / 10000.0, 4) AS sum_disc_price,
        |  round(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 1000000.0) AS BIGINT)) / 1000000.0, 6) AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) / count(l_extendedprice) / 100.0, 4) AS avg_price,
        |  round(sum(CAST(round(l_discount * 100.0) AS BIGINT)) / count(l_discount) / 100.0, 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1999-12-31'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT round(sum(CAST(round(l_extendedprice * l_discount * 10000.0) AS BIGINT)) / 10000.0, 4) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey,
        |  round(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000.0) AS BIGINT)) / 10000.0, 4) AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1999-01-01'
        |  AND l_shipdate > TIMESTAMP '1999-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 20""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q5_supplier_volume" ->
      """SELECT n_name,
        |  round(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000.0) AS BIGINT)) / 10000.0, 4) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q_monthly_orders" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
        |  count(*) AS n_orders,
        |  round(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) / 100.0, 2) AS total
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_distinct" ->
      """SELECT count(DISTINCT o_custkey) AS n_cust,
        |  count(DISTINCT o_orderpriority) AS n_pri
        |FROM orders""".stripMargin,
    "q_conditional_agg" ->
      """SELECT l_returnflag,
        |  count(*) FILTER (WHERE l_quantity > 25) AS big_qty_cnt,
        |  round(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) FILTER (WHERE l_discount > 0.05) / 100.0, 2) AS discounted_price,
        |  round(avg(l_quantity) FILTER (WHERE l_tax > 0.04), 4) AS avg_taxed_qty
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
  )
}
