package graft

import org.apache.spark.sql.SparkSession

/** Dev-only single-query timer (not part of the driver contract): the
  * Bench session config, solo reps per named query, one DEVBENCH line
  * each — for re-measuring a changed plan against its BASELINE.md row
  * without paying a full official pass. (Round 13 folded the former
  * graft.tools.DevBench twin into this one file — same behavior.)
  *
  * Usage: runMain graft.DevBench <sfDir> <reps> <name> [name...]
  */
object DevBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
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
    names.foreach { name =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).count()
        GraftSession.releaseQueryCaches(spark)
        (System.nanoTime() - t0) / 1e9
      }
      val warm = if (times.size > 1) times.tail.min else times.head
      println(f"DEVBENCH $dir $name cold=${times.head}%.3f warm=$warm%.3f " +
        f"all=${times.map(t => f"$t%.2f").mkString(",")} load=${
          java.lang.management.ManagementFactory.getOperatingSystemMXBean
            .getSystemLoadAverage}%.1f")
    }
    spark.stop()
  }
}
