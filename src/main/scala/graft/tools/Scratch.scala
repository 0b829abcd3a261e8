package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B harness for in-flight design measurements (not part of any
  * contract; contents change per experiment). Current experiment:
  * prefix-extension sweep for the containment family — candidate-pair
  * counts, full-row times, and output-hash equality across
  * spark.graft.prefix.ext values.
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
    val ks = if (args.length > 1) args.drop(1).map(_.toLong).toSeq
             else Seq(1L, 2L, 4L, 6L)
    graft.sources.Tables.names.foreach { t =>
      val df = if (t == "events") graft.sources.Tables.events(spark, dir)
               else spark.read.parquet(s"$dir/$t.parquet")
      df.write.mode("overwrite").format("noop").save()
    }
    import graft.operators.Dedup
    def outHash(dfn: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = dfn.select(
        count(lit(1)),
        sum(pmod(xxhash64(col("contained_doc"), col("container_doc"),
          col("inter")), lit(1000000007L))))
        .collect()(0)
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      ks.foreach { k =>
        spark.conf.set("spark.graft.prefix.ext", k.toString)
        timed(s"d33 k=$k") {
          val h = outHash(Dedup.hotShingleDedup(spark, dir))
          println(s"  d33 k=$k census=${Dedup.lastContainmentCensus.get()} out=$h")
        }
        graft.GraftSession.releaseQueryCaches(spark)
        timed(s"d16 k=$k") {
          val h = outHash(Dedup.containmentDedup(spark, dir))
          println(s"  d16 k=$k census=${Dedup.lastContainmentCensus.get()} out=$h")
        }
        graft.GraftSession.releaseQueryCaches(spark)
        timed(s"d35 k=$k") {
          val h = outHash(Dedup.slicedDedup(spark, dir))
          println(s"  d35 k=$k out=$h")
        }
        graft.GraftSession.releaseQueryCaches(spark)
      }
    }
    spark.stop()
  }
}
