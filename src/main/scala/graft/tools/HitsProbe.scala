package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 A/B probe (verdict item 7): can q61's two half-steps per
  * round fold into ONE join-agg pass? A semantics-preserving fusion
  * does not exist — the hub update reads the CURRENT round's
  * authority scores (Gauss-Seidel), a hard data dependency — so the
  * candidate is the JACOBI variant: both updates read the PREVIOUS
  * round's scores, making the two joins independent subtrees of one
  * DAG (sequential stage depth 4 instead of 8). Jacobi HITS converges
  * to the same principal vectors but its round-k scores DIFFER, so
  * keeping it would mean re-deriving the q61 oracle — only worth
  * doing on a clear measured win. This probe times both forms
  * interleaved on the same session (the RegimeProbe discipline);
  * the SCALE.md round-13 section records the outcome.
  *
  * Usage: runMain graft.tools.HitsProbe <sfDir> <reps>
  */
object HitsProbe {

  private val Scale = graft.operators.Graph.HitsScale
  private val Iters = 4

  /** The Jacobi-fused form: per round ONE logical pass (two
    * independent joins in the same DAG level), same integer
    * fixed-point discipline and lazy-localCheckpoint lineage cuts as
    * the shipped operator.
    */
  private def jacobiHits(spark: SparkSession, dir: String): DataFrame = {
    val orders = graft.sources.Tables.orders(spark, dir)
    val lineitem = graft.sources.Tables.lineitem(spark, dir)
    val ed = orders.select(col("o_orderkey"), col("o_custkey"))
      .join(lineitem.select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .distinct()
    ed.persist()
    val custs = ed.select(col("c")).distinct()
    val parts = ed.select(col("p")).distinct()
    var hub = custs.crossJoin(broadcast(custs.agg(count(lit(1)).as("n"))))
      .select(col("c"), expr(s"$Scale div n").as("h"))
    var auth = parts.crossJoin(broadcast(parts.agg(count(lit(1)).as("n"))))
      .select(col("p"), expr(s"$Scale div n").as("a"))
    for (_ <- 1 to Iters) {
      val aRaw = ed.join(hub, Seq("c")).groupBy(col("p"))
        .agg(sum(col("h")).as("a")).localCheckpoint(false)
      val hRaw = ed.join(auth, Seq("p")).groupBy(col("c"))
        .agg(sum(col("a")).as("h")).localCheckpoint(false)
      auth = aRaw.crossJoin(broadcast(aRaw.agg(sum(col("a")).as("ta"))))
        .select(col("p"), expr(s"(a * $Scale) div ta").as("a"))
      hub = hRaw.crossJoin(broadcast(hRaw.agg(sum(col("h")).as("th"))))
        .select(col("c"), expr(s"(h * $Scale) div th").as("h"))
    }
    hub.select(col("c").as("k"), col("h").as("s"))
      .unionAll(auth.select(col("p"), col("a")))
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def timed(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      spark.catalog.clearCache()
      println(f"HITSPROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s load=${
        java.lang.management.ManagementFactory.getOperatingSystemMXBean
          .getSystemLoadAverage}%.1f")
    }
    (1 to reps).foreach { _ =>
      timed("alternating")(
        graft.operators.Graph.purchaseHits(spark, dir).count())
      timed("jacobi-fused")(jacobiHits(spark, dir).count())
    }
    spark.stop()
  }
}
