package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B harness for in-flight design measurements (not part of any
  * contract; contents change per experiment). Current experiment:
  * is the persisted fact cache actually served to the parity row's
  * consumers, and what does one aggregate over it cost?
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // session warm-up
    def timed[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"SCRATCH $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); a
    }
    val dir = args(0)
    val fact = graft.operators.Facts.factSales(spark, dir)
      .repartition(32, org.apache.spark.sql.functions.col("transaction_id")).persist()
    timed("count1")(fact.count())
    timed("count2")(fact.count())
    fact.createOrReplaceTempView("fact_sales")
    timed("sql_count")(spark.sql("SELECT count(*) FROM fact_sales").collect())
    timed("sql_agg1")(spark.sql(
      "SELECT product_category, sum(CAST(net_amount AS DECIMAL(18,6))), count(DISTINCT transaction_id) FROM fact_sales GROUP BY 1").collect())
    timed("sql_agg2")(spark.sql(
      "SELECT product_category, sum(CAST(net_amount AS DECIMAL(18,6))), count(DISTINCT transaction_id) FROM fact_sales GROUP BY 1").collect())
    println("SCRATCH inmem_used " + spark.sparkContext.getPersistentRDDs.size)
    spark.stop()
  }
}
