package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Analytical query surface of the reference warehouse re-expressed
  * Spark-first on the test-table star schema.
  *
  * Covers the 8 queries in /root/reference/sql/analytical_queries.sql and
  * the dashboard analytics in /root/reference/streamlit_app.py (heatmap
  * pivot, rank/share windows, priority/status matrix), plus two
  * join/aggregation engine baselines (q20, q21).
  *
  * Scale notes (100 TB):
  *  - dims (part, customer, nation, region) are broadcast; only
  *    fact⋈fact joins (lineitem⋈orders on orderkey) shuffle.
  *  - every groupBy benefits from partial (map-side) aggregation; AQE
  *    coalesces post-shuffle partitions.
  *  - unpartitioned windows (share-of-total, MoM lag) run on POST-AGG
  *    rows only (dozens-to-hundreds of rows), never on the fact table.
  */
object Analytics {

  private def iso_dow(c: Column): Column = ((dayofweek(c) + lit(5)) % lit(7)) + lit(1)
  private def nz(c: Column): Column = when(c === 0.0, lit(null)).otherwise(c)

  // ─── q01 monthly sales trend (analytical_queries.sql:6-26) ───────────
  def monthlySalesTrend(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val m = o.groupBy(
        year(col("o_orderdate")).cast("long").as("year"),
        month(col("o_orderdate")).cast("long").as("month"),
        date_format(col("o_orderdate"), "MMMM").as("month_name"))
      .agg(
        sum(col("o_totalprice")).as("rev_raw"),
        countDistinct(col("o_orderkey")).as("total_transactions"),
        countDistinct(col("o_custkey")).as("unique_customers"),
        avg(col("o_totalprice")).as("aov_raw"))
    val w = Window.orderBy(col("year"), col("month"))
    m.withColumn("prev_raw", lag(col("rev_raw"), 1).over(w))
      .select(
        col("year"), col("month"), col("month_name"),
        round(col("rev_raw"), 2).as("total_revenue"),
        col("total_transactions"), col("unique_customers"),
        round(col("aov_raw"), 2).as("avg_order_value"),
        round(col("prev_raw"), 2).as("prev_month_revenue"),
        round((col("rev_raw") - col("prev_raw")) / nz(col("prev_raw")) * 100, 2)
          .as("mom_growth_pct"))
  }

  // ─── q02 category performance w/ share-of-total (sql:29-45) ──────────
  def categoryPerformance(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir).select(col("p_partkey"), col("p_type"))
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    val m = li
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("p_type").as("product_category"))
      .agg(
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev_raw"),
        countDistinct(col("l_orderkey")).as("total_transactions"),
        sum(col("l_quantity")).as("total_quantity"),
        avg(col("l_extendedprice")).as("avg_price_raw"),
        countDistinct(col("o_custkey")).as("unique_customers"),
        countDistinct(col("l_partkey")).as("unique_parts"))
    val wAll = Window.partitionBy() // post-agg: ≤ #categories rows
    m.select(
      col("product_category"),
      round(col("rev_raw"), 2).as("total_revenue"),
      round(col("rev_raw") / sum(col("rev_raw")).over(wAll) * 100, 2).as("revenue_share_pct"),
      col("total_transactions"), col("total_quantity"),
      round(col("avg_price_raw"), 2).as("avg_unit_price"),
      col("unique_customers"), col("unique_parts"))
  }

  // ─── q03 customer segmentation (sql:48-62; transform.py:207-218) ─────
  def customerSegmentation(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val perCust = c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      .agg(
        count(col("o_orderkey")).as("cnt"),
        coalesce(sum(col("o_totalprice")), lit(0.0)).as("rev"))
      .withColumn("customer_segment",
        when(col("cnt") <= 1, "New")
          .when(col("cnt") <= 3, "Occasional")
          .when(col("cnt") <= 5, "Regular")
          .otherwise("Loyal"))
      .withColumn("balance_band",
        when(col("c_acctbal") < 0, "Debt")
          .when(col("c_acctbal") < 2500, "Low")
          .when(col("c_acctbal") < 5000, "Mid")
          .when(col("c_acctbal") < 7500, "High")
          .otherwise("Premium"))
    perCust.groupBy(col("customer_segment"), col("balance_band"))
      .agg(
        count(lit(1)).as("customer_count"),
        round(sum(col("rev")), 2).as("total_revenue"),
        round(sum(col("rev")) / nz(sum(col("cnt")).cast("double")), 2).as("avg_order_value"),
        sum(col("cnt")).as("total_orders"),
        round(avg(col("cnt")), 1).as("avg_orders_per_customer"))
  }

  // ─── q04 segment × priority (gender analog, sql:65-75) ───────────────
  def segmentCategoryAnalysis(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"), col("o_orderpriority").as("priority"))
      .agg(
        round(sum(col("o_totalprice")), 2).as("total_revenue"),
        countDistinct(col("o_orderkey")).as("total_transactions"),
        round(avg(col("o_totalprice")), 2).as("avg_order_value"),
        round(avg(col("c_acctbal")), 1).as("avg_acctbal"))
  }

  // ─── q05 weekend vs weekday (sql:78-88) ──────────────────────────────
  def weekendWeekday(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.groupBy(
        when(iso_dow(col("o_orderdate")) >= 6, "Weekend").otherwise("Weekday").as("day_type"),
        date_format(col("o_orderdate"), "EEEE").as("day_name"),
        iso_dow(col("o_orderdate")).cast("long").as("day_of_week"))
      .agg(
        round(sum(col("o_totalprice")), 2).as("total_revenue"),
        countDistinct(col("o_orderkey")).as("total_transactions"),
        round(avg(col("o_totalprice")), 2).as("avg_order_value"))
  }

  // ─── q06 top customers (sql:91-108) ──────────────────────────────────
  def topCustomers(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    // rank on the ROUNDED revenue + key tiebreak → deterministic top-N
    o.groupBy(col("o_custkey"))
      .agg(
        round(sum(col("o_totalprice")), 2).as("total_revenue"),
        count(col("o_orderkey")).as("total_orders"),
        round(avg(col("o_totalprice")), 2).as("avg_order_value"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .select(
        col("c_custkey").as("customer_id"),
        col("c_name").as("customer_name"),
        col("c_mktsegment").as("segment"),
        col("c_acctbal").as("acctbal"),
        col("total_orders"), col("total_revenue"), col("avg_order_value"))
      .orderBy(col("total_revenue").desc, col("customer_id"))
      .limit(20) // planned as TakeOrderedAndProject — no global sort
  }

  // ─── q07 product catalog overview (sql:111-123) ──────────────────────
  def productCatalog(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    p.groupBy(col("p_type").as("product_category"))
      .agg(
        count(lit(1)).as("product_count"),
        round(avg(col("p_retailprice")), 2).as("avg_price"),
        round(min(col("p_retailprice")), 2).as("min_price"),
        round(max(col("p_retailprice")), 2).as("max_price"),
        round(avg(col("p_size")), 1).as("avg_size"),
        countDistinct(col("p_brand")).as("brand_count"))
  }

  // ─── q08 quarterly trend w/ YoY LAG(4) (sql:126-142) ─────────────────
  def quarterlyYoy(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val q = o.groupBy(
        year(col("o_orderdate")).cast("long").as("year"),
        quarter(col("o_orderdate")).cast("long").as("quarter"))
      .agg(
        sum(col("o_totalprice")).as("rev_raw"),
        countDistinct(col("o_orderkey")).as("quarterly_transactions"),
        countDistinct(col("o_custkey")).as("quarterly_customers"))
    val w = Window.orderBy(col("year"), col("quarter"))
    q.withColumn("prev_raw", lag(col("rev_raw"), 4).over(w))
      .select(
        col("year"), col("quarter"),
        round(col("rev_raw"), 2).as("quarterly_revenue"),
        col("quarterly_transactions"), col("quarterly_customers"),
        round(col("prev_raw"), 2).as("same_quarter_prev_year"),
        round((col("rev_raw") - col("prev_raw")) / nz(col("prev_raw")) * 100, 2)
          .as("yoy_growth_pct"))
  }

  // ─── q16 day × month heatmap pivot (streamlit_app.py:907-918) ────────
  def dayMonthHeatmap(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.groupBy(
        date_format(col("o_orderdate"), "EEEE").as("day_name"),
        iso_dow(col("o_orderdate")).cast("long").as("day_of_week"),
        month(col("o_orderdate")).cast("long").as("month"))
      .agg(
        round(sum(col("o_totalprice")), 2).as("total_revenue"),
        count(lit(1)).as("n_orders"))
  }

  // ─── q17 brand revenue rank / share / cumulative windows ─────────────
  def revenueRankWindow(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir).select(col("p_partkey"), col("p_brand"))
    val m = li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev_raw"))
      .withColumn("rev_r", round(col("rev_raw"), 2))
    val byRev = Window.orderBy(col("rev_r").desc, col("brand"))
    val all = Window.partitionBy()
    m.select(
      col("brand"),
      col("rev_r").as("total_revenue"),
      row_number().over(byRev).cast("long").as("revenue_rank"),
      round(col("rev_raw") / sum(col("rev_raw")).over(all) * 100, 2).as("revenue_share_pct"),
      round(sum(col("rev_r")).over(byRev.rowsBetween(Window.unboundedPreceding, 0)), 2)
        .as("cumulative_revenue"))
  }

  // ─── q18 priority × status matrix (dag validation analog) ────────────
  def priorityStatusMatrix(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val m = o.groupBy(col("o_orderpriority").as("priority"), col("o_orderstatus").as("status"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total_revenue"))
    val wp = Window.partitionBy(col("priority"))
    m.withColumn("pct_of_priority",
      round(col("n_orders").cast("double") / sum(col("n_orders")).over(wp).cast("double") * 100, 2))
  }

  // ─── q20 pricing summary: full-scan aggregation baseline ─────────────
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("2000-01-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 2).as("avg_qty"),
        round(avg(col("l_extendedprice")), 2).as("avg_price"),
        round(avg(col("l_discount")), 2).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  // ─── q21 region/nation revenue rollup: broadcast join chain ──────────
  def regionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
    val n = Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val r = Tables.region(spark, dir)
    o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
      .agg(
        round(sum(col("o_totalprice")), 2).as("total_revenue"),
        countDistinct(col("o_custkey")).as("n_customers"),
        countDistinct(col("o_orderkey")).as("n_orders"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_monthly_sales_trend" -> monthlySalesTrend,
    "q02_category_performance" -> categoryPerformance,
    "q03_customer_segmentation" -> customerSegmentation,
    "q04_segment_category_analysis" -> segmentCategoryAnalysis,
    "q05_weekend_weekday" -> weekendWeekday,
    "q06_top_customers" -> topCustomers,
    "q07_product_catalog" -> productCatalog,
    "q08_quarterly_yoy" -> quarterlyYoy,
    "q16_day_month_heatmap" -> dayMonthHeatmap,
    "q17_revenue_rank_window" -> revenueRankWindow,
    "q18_priority_status_matrix" -> priorityStatusMatrix,
    "q20_pricing_summary" -> pricingSummary,
    "q21_region_revenue" -> regionRevenue)

  val oracle: Map[String, String] = Map(
    "q01_monthly_sales_trend" ->
      """WITH m AS (
        |  SELECT year(o_orderdate) AS year, month(o_orderdate) AS month,
        |         monthname(o_orderdate) AS month_name,
        |         sum(o_totalprice) AS rev_raw,
        |         count(DISTINCT o_orderkey) AS total_transactions,
        |         count(DISTINCT o_custkey) AS unique_customers,
        |         avg(o_totalprice) AS aov_raw
        |  FROM orders GROUP BY 1, 2, 3)
        |SELECT year, month, month_name,
        |       round(rev_raw, 2) AS total_revenue,
        |       total_transactions, unique_customers,
        |       round(aov_raw, 2) AS avg_order_value,
        |       round(lag(rev_raw) OVER (ORDER BY year, month), 2) AS prev_month_revenue,
        |       round((rev_raw - lag(rev_raw) OVER (ORDER BY year, month))
        |             / nullif(lag(rev_raw) OVER (ORDER BY year, month), 0) * 100, 2) AS mom_growth_pct
        |FROM m""".stripMargin,
    "q02_category_performance" ->
      """WITH m AS (
        |  SELECT p_type AS product_category,
        |         sum(l_extendedprice * (1.0 - l_discount)) AS rev_raw,
        |         count(DISTINCT l_orderkey) AS total_transactions,
        |         sum(l_quantity) AS total_quantity,
        |         avg(l_extendedprice) AS avg_price_raw,
        |         count(DISTINCT o_custkey) AS unique_customers,
        |         count(DISTINCT l_partkey) AS unique_parts
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1)
        |SELECT product_category, round(rev_raw, 2) AS total_revenue,
        |       round(rev_raw / sum(rev_raw) OVER () * 100, 2) AS revenue_share_pct,
        |       total_transactions, total_quantity,
        |       round(avg_price_raw, 2) AS avg_unit_price,
        |       unique_customers, unique_parts
        |FROM m""".stripMargin,
    "q03_customer_segmentation" ->
      """WITH pc AS (
        |  SELECT c_custkey, c_mktsegment, c_acctbal,
        |         count(o_orderkey) AS cnt,
        |         coalesce(sum(o_totalprice), 0.0) AS rev
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY 1, 2, 3),
        |seg AS (
        |  SELECT *,
        |    CASE WHEN cnt <= 1 THEN 'New' WHEN cnt <= 3 THEN 'Occasional'
        |         WHEN cnt <= 5 THEN 'Regular' ELSE 'Loyal' END AS customer_segment,
        |    CASE WHEN c_acctbal < 0 THEN 'Debt' WHEN c_acctbal < 2500 THEN 'Low'
        |         WHEN c_acctbal < 5000 THEN 'Mid' WHEN c_acctbal < 7500 THEN 'High'
        |         ELSE 'Premium' END AS balance_band
        |  FROM pc)
        |SELECT customer_segment, balance_band,
        |       count(*) AS customer_count,
        |       round(sum(rev), 2) AS total_revenue,
        |       round(sum(rev) / nullif(CAST(sum(cnt) AS DOUBLE), 0), 2) AS avg_order_value,
        |       CAST(sum(cnt) AS BIGINT) AS total_orders,
        |       round(avg(cnt), 1) AS avg_orders_per_customer
        |FROM seg GROUP BY 1, 2""".stripMargin,
    "q04_segment_category_analysis" ->
      """SELECT c_mktsegment AS segment, o_orderpriority AS priority,
        |       round(sum(o_totalprice), 2) AS total_revenue,
        |       count(DISTINCT o_orderkey) AS total_transactions,
        |       round(avg(o_totalprice), 2) AS avg_order_value,
        |       round(avg(c_acctbal), 1) AS avg_acctbal
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1, 2""".stripMargin,
    "q05_weekend_weekday" ->
      """SELECT CASE WHEN isodow(o_orderdate) >= 6 THEN 'Weekend' ELSE 'Weekday' END AS day_type,
        |       dayname(o_orderdate) AS day_name,
        |       CAST(isodow(o_orderdate) AS BIGINT) AS day_of_week,
        |       round(sum(o_totalprice), 2) AS total_revenue,
        |       count(DISTINCT o_orderkey) AS total_transactions,
        |       round(avg(o_totalprice), 2) AS avg_order_value
        |FROM orders GROUP BY 1, 2, 3""".stripMargin,
    "q06_top_customers" ->
      """WITH agg AS (
        |  SELECT o_custkey,
        |         round(sum(o_totalprice), 2) AS total_revenue,
        |         count(o_orderkey) AS total_orders,
        |         round(avg(o_totalprice), 2) AS avg_order_value
        |  FROM orders GROUP BY 1)
        |SELECT c_custkey AS customer_id, c_name AS customer_name,
        |       c_mktsegment AS segment, c_acctbal AS acctbal,
        |       total_orders, total_revenue, avg_order_value
        |FROM agg JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_revenue DESC, customer_id
        |LIMIT 20""".stripMargin,
    "q07_product_catalog" ->
      """SELECT p_type AS product_category,
        |       count(*) AS product_count,
        |       round(avg(p_retailprice), 2) AS avg_price,
        |       round(min(p_retailprice), 2) AS min_price,
        |       round(max(p_retailprice), 2) AS max_price,
        |       round(avg(p_size), 1) AS avg_size,
        |       count(DISTINCT p_brand) AS brand_count
        |FROM part GROUP BY 1""".stripMargin,
    "q08_quarterly_yoy" ->
      """WITH q AS (
        |  SELECT year(o_orderdate) AS year, quarter(o_orderdate) AS quarter,
        |         sum(o_totalprice) AS rev_raw,
        |         count(DISTINCT o_orderkey) AS quarterly_transactions,
        |         count(DISTINCT o_custkey) AS quarterly_customers
        |  FROM orders GROUP BY 1, 2)
        |SELECT year, quarter,
        |       round(rev_raw, 2) AS quarterly_revenue,
        |       quarterly_transactions, quarterly_customers,
        |       round(lag(rev_raw, 4) OVER (ORDER BY year, quarter), 2) AS same_quarter_prev_year,
        |       round((rev_raw - lag(rev_raw, 4) OVER (ORDER BY year, quarter))
        |             / nullif(lag(rev_raw, 4) OVER (ORDER BY year, quarter), 0) * 100, 2) AS yoy_growth_pct
        |FROM q""".stripMargin,
    "q16_day_month_heatmap" ->
      """SELECT dayname(o_orderdate) AS day_name,
        |       CAST(isodow(o_orderdate) AS BIGINT) AS day_of_week,
        |       CAST(month(o_orderdate) AS BIGINT) AS month,
        |       round(sum(o_totalprice), 2) AS total_revenue,
        |       count(*) AS n_orders
        |FROM orders GROUP BY 1, 2, 3""".stripMargin,
    "q17_revenue_rank_window" ->
      """WITH m AS (
        |  SELECT p_brand AS brand,
        |         sum(l_extendedprice * (1.0 - l_discount)) AS rev_raw,
        |         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS rev_r
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1)
        |SELECT brand, rev_r AS total_revenue,
        |       CAST(row_number() OVER (ORDER BY rev_r DESC, brand) AS BIGINT) AS revenue_rank,
        |       round(rev_raw / sum(rev_raw) OVER () * 100, 2) AS revenue_share_pct,
        |       round(sum(rev_r) OVER (ORDER BY rev_r DESC, brand
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cumulative_revenue
        |FROM m""".stripMargin,
    "q18_priority_status_matrix" ->
      """WITH m AS (
        |  SELECT o_orderpriority AS priority, o_orderstatus AS status,
        |         count(*) AS n_orders,
        |         round(sum(o_totalprice), 2) AS total_revenue
        |  FROM orders GROUP BY 1, 2)
        |SELECT priority, status, n_orders, total_revenue,
        |       round(CAST(n_orders AS DOUBLE)
        |             / CAST(sum(n_orders) OVER (PARTITION BY priority) AS DOUBLE) * 100, 2) AS pct_of_priority
        |FROM m""".stripMargin,
    "q20_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       sum(l_quantity) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_base_price,
        |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |       round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
        |       round(avg(l_quantity), 2) AS avg_qty,
        |       round(avg(l_extendedprice), 2) AS avg_price,
        |       round(avg(l_discount), 2) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
        |GROUP BY 1, 2""".stripMargin,
    "q21_region_revenue" ->
      """SELECT r_name AS region, n_name AS nation,
        |       round(sum(o_totalprice), 2) AS total_revenue,
        |       count(DISTINCT o_custkey) AS n_customers,
        |       count(DISTINCT o_orderkey) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2""".stripMargin)
}
