package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B harness for in-flight design measurements (not part of any
  * contract; contents change per experiment). Current experiment:
  * stream_curation decomposition — full row vs 3 manual
  * ingestShardCore ticks vs per-tick publish/probe phases.
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
    import graft.operators.Dedup
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      timed("full stream_curation") {
        println("  rows=" + graft.streaming.StreamQueries
          .streamCuration(spark, dir).count())
      }
      graft.GraftSession.releaseQueryCaches(spark)
      // manual 3-tick replay at the feed width the wrapper would use
      val saved = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", 4)
      val idx = java.nio.file.Files.createTempDirectory("scratch_cur").toString
      val docs = graft.sources.Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))
      try {
        (0 until 3).foreach { i =>
          timed(s"tick $i") {
            Dedup.ingestShardCore(
              docs.filter(pmod(xxhash64(col("doc_id")), lit(3L)) === i),
              s"$idx/index", s"b$i").count()
          }
        }
        timed("standing rollup") {
          println("  rows=" + Dedup.standingRemovals(spark, s"$idx/index").count())
        }
      } finally {
        spark.conf.set("spark.sql.shuffle.partitions", saved)
        graft.GraftSession.releaseQueryCaches(spark)
      }
    }
    spark.stop()
  }
}
