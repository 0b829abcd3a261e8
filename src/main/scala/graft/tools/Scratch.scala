package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B harness for in-flight design measurements (not part of any
  * contract; contents change per experiment). Current experiment:
  * stream_quality phase split — ridge train vs staging vs drain.
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
    graft.sources.Tables.names.foreach { t =>
      val df = if (t == "events") graft.sources.Tables.events(spark, dir)
               else spark.read.parquet(s"$dir/$t.parquet")
      df.write.mode("overwrite").format("noop").save()
    }
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      val model = timed("ridge trainModel") {
        graft.streaming.QualityStream.trainModel(spark, dir)
      }
      timed("score batch (noop)") {
        graft.streaming.QualityStream
          .scored(graft.sources.Tables.documents(spark, dir), model)
          .write.mode("overwrite").format("noop").save()
      }
      timed("full stream_quality row") {
        graft.streaming.StreamQueries.streamQuality(spark, dir).count()
      }
      graft.GraftSession.releaseQueryCaches(spark)
    }
    spark.stop()
  }
}
