package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Data-mart builders (/root/reference/etl/transform.py:393-507):
  * pre-aggregated analytical tables — monthly performance with MoM
  * growth, category analysis with revenue share and a segment pivot
  * (the reference's gender-split pivot, transform.py:465-494).
  *
  * Scale: marts are post-aggregation tables (10^2-10^4 rows) built in a
  * single shuffle from the fact grain; pivots are conditional
  * aggregations (no `pivot()` schema inference pass over the data).
  */
object Marts {

  // ─── q13 sales performance mart (transform.py:393-433) ───────────────
  def martSalesPerformance(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val m = li.groupBy(
        year(col("l_shipdate")).cast("long").as("year"),
        month(col("l_shipdate")).cast("long").as("month"),
        date_format(col("l_shipdate"), "MMMM").as("month_name"))
      .agg(
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev_raw"),
        sum(col("l_quantity")).as("total_quantity"),
        count(lit(1)).as("total_lines"),
        countDistinct(col("l_partkey")).as("unique_parts"),
        sum(col("l_extendedprice")).as("ep_sum"))
    val w = Window.orderBy(col("year"), col("month"))
    m.withColumn("prev_r", round(lag(col("rev_raw"), 1).over(w), 2))
      .select(
        col("year"), col("month"), col("month_name"),
        round(col("rev_raw"), 2).as("total_revenue"),
        col("total_quantity"), col("total_lines"), col("unique_parts"),
        (round(col("ep_sum"), 2) / col("total_lines")).as("avg_line_value"),
        col("prev_r").as("revenue_prev_month"),
        ((round(col("rev_raw"), 2) - col("prev_r"))
          / when(col("prev_r") === 0.0, lit(null)).otherwise(col("prev_r")) * 100)
          .as("revenue_growth_pct"))
  }

  // ─── q14 category analysis mart w/ segment pivot (transform.py:436-507)
  def martCategoryAnalysis(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir).select(col("p_partkey"), col("p_type"))
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    val net = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val m = li
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("p_type").as("product_category"))
      .agg(
        sum(net).as("rev_raw"),
        countDistinct(col("l_orderkey")).as("total_transactions"),
        sum(col("l_quantity")).as("total_quantity"),
        sum(col("l_extendedprice")).as("ep_sum"),
        count(lit(1)).as("n_lines"),
        countDistinct(col("o_custkey")).as("unique_customers"),
        sum(col("c_acctbal")).as("bal_sum"),
        // segment pivot — reference's gender-split percentages
        sum(when(col("c_mktsegment") === "AUTOMOBILE", net).otherwise(0.0)).as("auto_raw"),
        sum(when(col("c_mktsegment") === "BUILDING", net).otherwise(0.0)).as("bldg_raw"))
    val all = Window.partitionBy()
    m.select(
      col("product_category"),
      round(col("rev_raw"), 2).as("total_revenue"),
      round(col("rev_raw") / sum(col("rev_raw")).over(all) * 100, 2).as("revenue_share_pct"),
      col("total_transactions"), col("total_quantity"),
      (round(col("ep_sum"), 2) / col("n_lines")).as("avg_price"),
      col("unique_customers"),
      (round(col("bal_sum"), 2) / col("n_lines")).as("avg_acctbal"),
      round(col("auto_raw") / col("rev_raw") * 100, 2).as("automobile_revenue_pct"),
      round(col("bldg_raw") / col("rev_raw") * 100, 2).as("building_revenue_pct"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q13_mart_sales_performance" -> martSalesPerformance,
    "q14_mart_category_analysis" -> martCategoryAnalysis)

  val oracle: Map[String, String] = Map(
    "q13_mart_sales_performance" ->
      """WITH m AS (
        |  SELECT year(l_shipdate) AS year, month(l_shipdate) AS month,
        |         monthname(l_shipdate) AS month_name,
        |         sum(l_extendedprice * (1.0 - l_discount)) AS rev_raw,
        |         sum(l_quantity) AS total_quantity,
        |         count(*) AS total_lines,
        |         count(DISTINCT l_partkey) AS unique_parts,
        |         sum(l_extendedprice) AS ep_sum
        |  FROM lineitem GROUP BY 1, 2, 3),
        |w AS (
        |  SELECT *, round(lag(rev_raw) OVER (ORDER BY year, month), 2) AS prev_r FROM m)
        |SELECT year, month, month_name,
        |       round(rev_raw, 2) AS total_revenue,
        |       total_quantity, total_lines, unique_parts,
        |       round(ep_sum, 2) / total_lines AS avg_line_value,
        |       prev_r AS revenue_prev_month,
        |       (round(rev_raw, 2) - prev_r) / nullif(prev_r, 0) * 100 AS revenue_growth_pct
        |FROM w""".stripMargin,
    "q14_mart_category_analysis" ->
      """WITH m AS (
        |  SELECT p_type AS product_category,
        |         sum(l_extendedprice * (1.0 - l_discount)) AS rev_raw,
        |         count(DISTINCT l_orderkey) AS total_transactions,
        |         sum(l_quantity) AS total_quantity,
        |         sum(l_extendedprice) AS ep_sum,
        |         count(*) AS n_lines,
        |         count(DISTINCT o_custkey) AS unique_customers,
        |         sum(c_acctbal) AS bal_sum,
        |         sum(CASE WHEN c_mktsegment = 'AUTOMOBILE'
        |                  THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END) AS auto_raw,
        |         sum(CASE WHEN c_mktsegment = 'BUILDING'
        |                  THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END) AS bldg_raw
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1)
        |SELECT product_category,
        |       round(rev_raw, 2) AS total_revenue,
        |       round(rev_raw / sum(rev_raw) OVER () * 100, 2) AS revenue_share_pct,
        |       total_transactions, total_quantity,
        |       round(ep_sum, 2) / n_lines AS avg_price,
        |       unique_customers,
        |       round(bal_sum, 2) / n_lines AS avg_acctbal,
        |       round(auto_raw / rev_raw * 100, 2) AS automobile_revenue_pct,
        |       round(bldg_raw / rev_raw * 100, 2) AS building_revenue_pct
        |FROM m""".stripMargin)
}
