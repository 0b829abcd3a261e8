package graft

import org.apache.spark.sql.SparkSession

/** Scratch single-query timer for local A/B iteration (not part of the
  * driver contract; excluded from records).
  * Usage: runMain graft.DevBench <sfDir> <reps> <query...>
  */
object DevBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.sources.Tables.names.foreach { t =>
      val df = if (t == "events") graft.sources.Tables.events(spark, sfDir)
               else spark.read.parquet(s"$sfDir/$t.parquet")
      df.write.mode("overwrite").format("noop").save()
    }
    (1 to reps).foreach { r =>
      names.foreach { name =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        spark.catalog.clearCache()
        println(f"DEVBENCH $name rep$r ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
