package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dimensions, Facts, ReferenceQueries}

/** Dev-only stage profiler for the r_sql_parity row: times the cache
  * build and each SQL/twin job so optimization targets the actual cost
  * (not part of the driver contract).
  */
object ParityProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.sources.Tables.names.foreach { t =>
      val df = if (t == "events") graft.sources.Tables.events(spark, dir)
               else spark.read.parquet(s"$dir/$t.parquet")
      df.write.mode("overwrite").format("noop").save()
    }
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PARITY $name%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      val w = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val fact = time("fact build+persist") {
        val f = Facts.factSales(spark, dir)
          .repartition(w, col("transaction_id")).persist()
        f.write.format("noop").mode("overwrite").save(); f
      }
      val dimDate = time("dimDate") {
        val f = Dimensions.dimDate(spark, dir).persist()
        f.write.format("noop").mode("overwrite").save(); f
      }
      val dimCust = time("dimCust") {
        val f = Dimensions.dimCustomerHashed(spark, dir).persist()
        f.write.format("noop").mode("overwrite").save(); f
      }
      val dimProd = time("dimProd") {
        val f = Dimensions.dimProduct(spark, dir).persist()
        f.write.format("noop").mode("overwrite").save(); f
      }
      val dimCat = time("dimCat") {
        val f = Facts.dimCategory(spark, dir).persist()
        f.write.format("noop").mode("overwrite").save(); f
      }
      fact.createOrReplaceTempView("fact_sales")
      dimDate.createOrReplaceTempView("dim_date")
      dimCust.createOrReplaceTempView("dim_customer")
      dimProd.createOrReplaceTempView("dim_product")
      dimCat.createOrReplaceTempView("dim_category")
      ReferenceQueries.names.foreach { name =>
        time(s"$name sql")(spark.sql(ReferenceQueries.sql(name)).collect())
        time(s"$name twin")(
          ReferenceQueries.twinOf(name, fact, dimDate, dimCust, spark, dir)
            .collect())
      }
      Seq(fact, dimDate, dimCust, dimProd, dimCat).foreach(_.unpersist())
      graft.GraftSession.releaseQueryCaches(spark)
    }
    spark.stop()
  }
}
