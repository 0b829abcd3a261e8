package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("full warehouse build writes all tables and reports stats") {
    val out = Files.createTempDirectory("graft_wh").toString
    val stats = Pipeline.run(spark, TestSpark.sf, out)
    assert(stats.map(_.table) == Seq(
      "stg_lineitem_clean", "dim_date", "dim_customer", "dim_category",
      "fact_sales", "mart_sales_performance", "mart_category_analysis"))
    assert(stats.forall(_.rows > 0))
    // published tables are readable and consistent
    val fact = spark.read.parquet(s"$out/fact_sales")
    val dimC = spark.read.parquet(s"$out/dim_customer")
    assert(fact.count() == stats.find(_.table == "fact_sales").get.rows)
    // every fact customer_key resolves against the dim (referential integrity)
    val orphans = fact.join(dimC, Seq("customer_key"), "left_anti").count()
    assert(orphans == 0)
    val log = Pipeline.runLog(spark, stats, "test_run")
    assert(log.where("status = 'SUCCESS'").count() == stats.length)
  }
}
