package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Money._
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
        out2(sum(net(col("l_extendedprice"), col("l_discount")))).as("total_revenue"),
        sum(col("l_quantity")).as("total_quantity"),
        count(lit(1)).as("total_lines"),
        countDistinct(col("l_partkey")).as("unique_parts"),
        sum(m2(col("l_extendedprice"))).as("ep_dec"))
    val w = Window.orderBy(col("year"), col("month"))
    m.withColumn("prev_r", lag(col("total_revenue"), 1).over(w))
      .select(
        col("year"), col("month"), col("month_name"),
        col("total_revenue"),
        col("total_quantity"), col("total_lines"), col("unique_parts"),
        (out2(col("ep_dec")) / col("total_lines")).as("avg_line_value"),
        col("prev_r").as("revenue_prev_month"),
        ((col("total_revenue") - col("prev_r"))
          / when(col("prev_r") === 0.0, lit(null)).otherwise(col("prev_r")) * 100)
          .as("revenue_growth_pct"))
  }

  // ─── q14 category analysis mart w/ segment pivot (transform.py:436-507)
  def martCategoryAnalysis(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir).select(col("p_partkey"), col("p_type"))
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    val netExpr = net(col("l_extendedprice"), col("l_discount"))
    val m = li
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("p_type").as("product_category"))
      .agg(
        sum(netExpr).as("rev_dec"),
        countDistinct(col("l_orderkey")).as("total_transactions"),
        sum(col("l_quantity")).as("total_quantity"),
        sum(m2(col("l_extendedprice"))).as("ep_dec"),
        count(lit(1)).as("n_lines"),
        countDistinct(col("o_custkey")).as("unique_customers"),
        sum(m2(col("c_acctbal"))).as("bal_dec"),
        // segment pivot — reference's gender-split percentages
        sum(when(col("c_mktsegment") === "AUTOMOBILE", netExpr)).as("auto_dec"),
        sum(when(col("c_mktsegment") === "BUILDING", netExpr)).as("bldg_dec"))
    val all = Window.partitionBy()
    m.select(
      col("product_category"),
      out2(col("rev_dec")).as("total_revenue"),
      round(outRaw(col("rev_dec")) / sum(outRaw(col("rev_dec"))).over(all) * 100, 2).as("revenue_share_pct"),
      col("total_transactions"), col("total_quantity"),
      (out2(col("ep_dec")) / col("n_lines")).as("avg_price"),
      col("unique_customers"),
      (out2(col("bal_dec")) / col("n_lines")).as("avg_acctbal"),
      round(coalesce(outRaw(col("auto_dec")), lit(0.0)) / outRaw(col("rev_dec")) * 100, 2).as("automobile_revenue_pct"),
      round(coalesce(outRaw(col("bldg_dec")), lit(0.0)) / outRaw(col("rev_dec")) * 100, 2).as("building_revenue_pct"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q13_mart_sales_performance" -> martSalesPerformance,
    "q14_mart_category_analysis" -> martCategoryAnalysis)

  val oracle: Map[String, String] = Map(
    "q13_mart_sales_performance" ->
      """WITH m AS (
        |  SELECT year(l_shipdate) AS year, month(l_shipdate) AS month,
        |         monthname(l_shipdate) AS month_name,
        |         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))), 2) AS DOUBLE) AS total_revenue,
        |         sum(l_quantity) AS total_quantity,
        |         count(*) AS total_lines,
        |         count(DISTINCT l_partkey) AS unique_parts,
        |         sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS ep_dec
        |  FROM lineitem GROUP BY 1, 2, 3),
        |w AS (
        |  SELECT *, lag(total_revenue) OVER (ORDER BY year, month) AS prev_r FROM m)
        |SELECT year, month, month_name, total_revenue,
        |       total_quantity, total_lines, unique_parts,
        |       CAST(round(ep_dec, 2) AS DOUBLE) / total_lines AS avg_line_value,
        |       prev_r AS revenue_prev_month,
        |       (total_revenue - prev_r) / nullif(prev_r, 0) * 100 AS revenue_growth_pct
        |FROM w""".stripMargin,
    "q14_mart_category_analysis" ->
      """WITH m AS (
        |  SELECT p_type AS product_category,
        |         sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS rev_dec,
        |         count(DISTINCT l_orderkey) AS total_transactions,
        |         sum(l_quantity) AS total_quantity,
        |         sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS ep_dec,
        |         count(*) AS n_lines,
        |         count(DISTINCT o_custkey) AS unique_customers,
        |         sum(CAST(c_acctbal AS DECIMAL(12,2))) AS bal_dec,
        |         sum(CASE WHEN c_mktsegment = 'AUTOMOBILE'
        |                  THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) END) AS auto_dec,
        |         sum(CASE WHEN c_mktsegment = 'BUILDING'
        |                  THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) END) AS bldg_dec
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1)
        |SELECT product_category,
        |       CAST(round(rev_dec, 2) AS DOUBLE) AS total_revenue,
        |       round(CAST(rev_dec AS DOUBLE) / sum(CAST(rev_dec AS DOUBLE)) OVER () * 100, 2) AS revenue_share_pct,
        |       total_transactions, total_quantity,
        |       CAST(round(ep_dec, 2) AS DOUBLE) / n_lines AS avg_price,
        |       unique_customers,
        |       CAST(round(bal_dec, 2) AS DOUBLE) / n_lines AS avg_acctbal,
        |       round(coalesce(CAST(auto_dec AS DOUBLE), 0.0) / CAST(rev_dec AS DOUBLE) * 100, 2) AS automobile_revenue_pct,
        |       round(coalesce(CAST(bldg_dec AS DOUBLE), 0.0) / CAST(rev_dec AS DOUBLE) * 100, 2) AS building_revenue_pct
        |FROM m""".stripMargin)
}
