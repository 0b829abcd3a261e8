package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dimensions, Facts, ReferenceQueries}

/** Reference-SQL parity over the registered warehouse: build the full
  * warehouse once, register it ([[Pipeline.registerWarehouse]]), then
  * run each of the reference's eight analytical queries
  * (sql/analytical_queries.sql:6-142 as carried in
  * [[ReferenceQueries]]) through `spark.sql` and pin the result
  * against an INDEPENDENTLY-EXPRESSED DataFrame twin computed from the
  * builder frames (pre-publish). The comparison therefore crosses the
  * whole new surface at once — publish, re-read, view registration,
  * and the SQL dialect — and the two expressions of each query's
  * semantics (SQL text vs DataFrame ops) check each other the same way
  * the DuckDB oracle checks the main query set. Exact compare, no
  * epsilon: both sides keep money sums in the decimal domain.
  */
class WarehouseSqlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft_wh_sql").toString
    Pipeline.run(spark, TestSpark.sf, dir)
    Pipeline.registerWarehouse(spark, dir)
    dir
  }

  // builder frames the twins aggregate (source-derived, never the
  // published parquet — that's the boundary under test)
  private lazy val fact = Facts.factSales(spark, TestSpark.sf)
  private lazy val dimDate = Dimensions.dimDate(spark, TestSpark.sf)
  private lazy val dimCust = Dimensions.dimCustomerHashed(spark, TestSpark.sf)

  private def dec(c: String) = col(c).cast("decimal(18,6)")
  private def r2d(c: org.apache.spark.sql.Column) = round(c, 2).cast("double")
  private def nullifZero(c: org.apache.spark.sql.Column) =
    when(c === 0, lit(null)).otherwise(c)

  /** Column-name-sorted, row-sorted, stringified frame — type drift
    * (decimal vs double) surfaces as a string mismatch, exactly like
    * the driver's oracle compare.
    */
  private def canon(df: DataFrame): Seq[Seq[String]] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect().toSeq
      .map(_.toSeq.map(v => if (v == null) "∅" else v.toString))
      .sortBy(_.mkString("|"))
  }

  private def check(name: String, twin: => DataFrame): Unit = {
    wh // force the warehouse build + registration
    val got = canon(spark.sql(ReferenceQueries.sql(name)))
    val want = canon(twin)
    assert(got.nonEmpty, s"$name returned no rows")
    assert(got == want, s"$name: SQL over registered warehouse != DataFrame twin")
  }

  test("registerWarehouse registers every published table, skipping internals") {
    assert(Pipeline.registerWarehouse(spark, wh) == Seq(
      "dim_category", "dim_customer", "dim_date", "dim_product",
      "fact_sales", "mart_category_analysis", "mart_sales_performance",
      "stg_lineitem_clean"))
    assert(spark.sql("SELECT count(*) AS n FROM fact_sales")
      .collect().head.getLong(0) > 0)
  }

  test("r1 monthly sales trend: SQL == twin") {
    check("r1_monthly_sales_trend", {
      val m = fact.join(dimDate, Seq("date_key"))
        .groupBy(col("year"), col("month"), col("month_name"))
        .agg(
          sum(dec("net_amount")).as("rev_dec"),
          countDistinct(col("transaction_id")).as("total_transactions"),
          sum(col("quantity")).as("total_units_sold"),
          countDistinct(col("customer_id")).as("unique_customers"))
      val w = Window.orderBy(col("year"), col("month"))
      m.withColumn("prev_dec", lag(col("rev_dec"), 1).over(w))
        .select(col("year"), col("month"), col("month_name"),
          r2d(col("rev_dec")).as("total_revenue"),
          col("total_transactions"), col("total_units_sold"),
          r2d(col("rev_dec") / col("total_transactions")).as("avg_order_value"),
          col("unique_customers"),
          r2d(col("prev_dec")).as("prev_month_revenue"),
          r2d((col("rev_dec") - col("prev_dec")) / nullifZero(col("prev_dec")) * 100)
            .as("mom_growth_pct"))
    })
  }

  test("r2 category performance: SQL == twin") {
    check("r2_category_performance", {
      val m = fact
        .groupBy(col("product_category"))
        .agg(
          sum(dec("net_amount")).as("rev_dec"),
          countDistinct(col("transaction_id")).as("total_transactions"),
          sum(col("quantity")).as("total_quantity"),
          sum(dec("price")).as("price_dec"),
          count(lit(1)).as("n_lines"),
          countDistinct(col("customer_id")).as("unique_customers"))
      val cat = Facts.dimCategory(spark, TestSpark.sf)
      m.join(cat, m("product_category") === cat("category_name"), "left")
        .select(col("product_category"), col("category_group"),
          r2d(col("rev_dec")).as("total_revenue"),
          r2d(col("rev_dec") / sum(col("rev_dec")).over(Window.partitionBy()) * 100)
            .as("revenue_share_pct"),
          col("total_transactions"), col("total_quantity"),
          r2d(col("price_dec") / col("n_lines")).as("avg_unit_price"),
          col("unique_customers"))
    })
  }

  test("r3 customer segmentation: SQL == twin") {
    check("r3_customer_segmentation", {
      fact.join(dimCust.where(col("is_current")), Seq("customer_key"))
        .groupBy(col("customer_segment"), col("balance_band"))
        .agg(
          countDistinct(dimCust("customer_id")).as("customer_count"),
          r2d(sum(dec("net_amount"))).as("total_revenue"),
          r2d(avg(dec("net_amount"))).as("avg_line_amount"),
          sum(col("quantity")).as("total_quantity"),
          round(avg(col("total_transactions")), 1).cast("double")
            .as("avg_purchases_per_customer"))
    })
  }

  test("r4 segment sales (demographic analog): SQL == twin") {
    check("r4_segment_sales", {
      fact.join(dimCust.where(col("is_current")), Seq("customer_key"))
        .groupBy(col("customer_segment"), col("product_category"))
        .agg(
          r2d(sum(dec("net_amount"))).as("total_revenue"),
          countDistinct(col("transaction_id")).as("total_transactions"),
          r2d(sum(dec("net_amount")) / countDistinct(col("transaction_id")))
            .as("avg_order_value"),
          round(avg(col("acctbal").cast("decimal(12,2)")), 1).cast("double")
            .as("avg_acctbal"))
    })
  }

  test("r5 weekend vs weekday: SQL == twin") {
    check("r5_weekend_weekday", {
      fact.join(dimDate, Seq("date_key"))
        .groupBy(
          when(col("is_weekend"), "Weekend").otherwise("Weekday").as("day_type"),
          col("day_name"), col("day_of_week"))
        .agg(
          r2d(sum(dec("net_amount"))).as("total_revenue"),
          countDistinct(col("transaction_id")).as("total_transactions"),
          r2d(sum(dec("net_amount")) / countDistinct(col("transaction_id")))
            .as("avg_order_value"))
    })
  }

  test("r6 top customers: SQL == twin") {
    check("r6_top_customers", {
      fact.join(dimCust.where(col("is_current")), Seq("customer_key"))
        .groupBy(dimCust("customer_id"), col("customer_name"),
          col("segment_attr"), col("balance_band"),
          col("customer_segment"), col("total_transactions"))
        .agg(
          r2d(sum(dec("net_amount"))).as("total_revenue"),
          sum(col("quantity")).as("total_quantity"),
          r2d(sum(dec("net_amount")) / countDistinct(col("transaction_id")))
            .as("avg_order_value"))
        .orderBy(col("total_revenue").desc, dimCust("customer_id"))
        .limit(20)
    })
  }

  test("r7 product catalog: SQL == twin") {
    check("r7_product_catalog", {
      Dimensions.dimProduct(spark, TestSpark.sf)
        .where(col("is_current"))
        .groupBy(col("product_category"))
        .agg(
          count(lit(1)).as("product_count"),
          round(avg(col("price").cast("decimal(12,2)")), 2).cast("double")
            .as("avg_price"),
          r2d(min(col("price"))).as("min_price"),
          r2d(max(col("price"))).as("max_price"))
    })
  }

  test("r8 quarterly yoy: SQL == twin") {
    check("r8_quarterly_yoy", {
      val q = fact.join(dimDate, Seq("date_key"))
        .groupBy(col("year"), col("quarter"))
        .agg(
          sum(dec("net_amount")).as("rev_dec"),
          countDistinct(col("transaction_id")).as("quarterly_transactions"),
          countDistinct(col("customer_id")).as("quarterly_customers"))
      val w = Window.orderBy(col("year"), col("quarter"))
      q.withColumn("prev_dec", lag(col("rev_dec"), 4).over(w))
        .select(col("year"), col("quarter"),
          r2d(col("rev_dec")).as("quarterly_revenue"),
          col("quarterly_transactions"), col("quarterly_customers"),
          r2d(col("prev_dec")).as("same_quarter_prev_year"),
          r2d((col("rev_dec") - col("prev_dec")) / nullifZero(col("prev_dec")) * 100)
            .as("yoy_growth_pct"))
    })
  }
}
