package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B harness for in-flight design measurements (not part of any
  * contract; contents change per experiment). Current experiment:
  * q59's per-round rank join at sf1 — does AQE still broadcast the
  * rank side at 10× the catalog (the round-14 rejection assumed so at
  * sf0.1 only), or does the q63 shuffle-hash logic apply from sf1 up?
  * Replays the q59 loop verbatim with and without the hint.
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
      println(f"SCRATCH $tag ${(System.nanoTime() - t0) / 1e9}%.2f s load=${
        java.lang.management.ManagementFactory.getOperatingSystemMXBean
          .getSystemLoadAverage}%.1f"); a
    }
    val dir = args(0)
    graft.sources.Tables.names.foreach { t =>
      val df = if (t == "events") graft.sources.Tables.events(spark, dir)
               else spark.read.parquet(s"$dir/$t.parquet")
      df.write.mode("overwrite").format("noop").save()
    }
    val Scale = 1000000000000L
    val Iters = 6
    def pagerank(hintRanks: Boolean): DataFrame = {
      val li = graft.sources.Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val ed = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") =!= col("b.l_partkey"))
        .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
        .distinct()
      val deg = ed.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val nF = deg.agg(count(lit(1)).as("n"))
      val teleF = nF.select(col("n"),
        expr(s"(15 * ($Scale div n)) div 100").as("tele"),
        expr(s"$Scale div n").as("r_init"))
      var ranks = deg.crossJoin(broadcast(teleF))
        .select(col("src").as("node"), col("deg"), col("r_init").as("r"))
      for (_ <- 1 to Iters) {
        val contribs = ranks.select(col("node").as("src"),
          expr("r div deg").as("contrib"))
        val s = ed
          .join(if (hintRanks) contribs.hint("shuffle_hash") else contribs,
            Seq("src"))
          .groupBy(col("dst")).agg(sum(col("contrib")).as("s"))
        ranks = deg.join(s.select(col("dst").as("src"), col("s")), Seq("src"), "left")
          .crossJoin(broadcast(teleF))
          .select(col("src").as("node"), col("deg"),
            expr("tele + (85 * coalesce(s, 0)) div 100").as("r"))
      }
      ranks.select(col("node").as("part_key"), col("deg").as("degree"),
        col("r").as("rank_fp"),
        (col("r").cast("double") / lit(Scale.toDouble)).as("rank"))
    }
    (1 to 3).foreach { rep =>
      println(s"--- rep $rep ---")
      timed("q59 as-is (no hint)") {
        pagerank(hintRanks = false).write.mode("overwrite").format("noop").save()
      }
      spark.catalog.clearCache()
      timed("q59 hinted (shuffle_hash)") {
        pagerank(hintRanks = true).write.mode("overwrite").format("noop").save()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
