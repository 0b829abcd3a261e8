package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ReferenceQueries

/** Reference-SQL parity over the registered warehouse: build the full
  * warehouse once, register it ([[Pipeline.registerWarehouse]]), then
  * run each of the reference's eight analytical queries
  * (sql/analytical_queries.sql:6-142 as carried in
  * [[ReferenceQueries]]) through `spark.sql` and pin the result
  * against the INDEPENDENTLY-EXPRESSED DataFrame twin
  * ([[ReferenceQueries.twin]] — DataFrame ops over the builder frames,
  * never the SQL text or the published parquet). The comparison
  * therefore crosses the whole surface at once — publish, re-read,
  * view registration, and the SQL dialect. Exact compare, no epsilon:
  * both sides keep money sums in the decimal domain. The same twins
  * also back the per-round driver row `r_sql_parity`
  * ([[ReferenceQueries.rSqlParity]]), which runs the SQL over
  * IN-MEMORY views; this spec is the published-warehouse seam.
  */
class WarehouseSqlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft_wh_sql").toString
    Pipeline.run(spark, TestSpark.sf, dir)
    Pipeline.registerWarehouse(spark, dir)
    dir
  }

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

  private def check(name: String): Unit = {
    wh // force the warehouse build + registration
    val got = canon(spark.sql(ReferenceQueries.sql(name)))
    val want = canon(ReferenceQueries.twin(name, spark, TestSpark.sf))
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
    check("r1_monthly_sales_trend")
  }

  test("r2 category performance: SQL == twin") {
    check("r2_category_performance")
  }

  test("r3 customer segmentation: SQL == twin") {
    check("r3_customer_segmentation")
  }

  test("r4 segment sales (demographic analog): SQL == twin") {
    check("r4_segment_sales")
  }

  test("r5 weekend vs weekday: SQL == twin") {
    check("r5_weekend_weekday")
  }

  test("r6 top customers: SQL == twin") {
    check("r6_top_customers")
  }

  test("r7 product catalog: SQL == twin") {
    check("r7_product_catalog")
  }

  test("r8 quarterly yoy: SQL == twin") {
    check("r8_quarterly_yoy")
  }
}
