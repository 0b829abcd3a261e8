package graft.tools

import org.apache.spark.sql.SparkSession

/** One-shot probe: the planner size estimates the containment family's
  * hot-key census gate reads (Dedup.containmentDedupOf), printed for a
  * given sf dir so the gate threshold is calibrated against observed
  * numbers instead of guessed ones.
  * Usage: runMain graft.tools.StatsProbe <sfDir>
  */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.documents(spark, args(0))
    def stat(tag: String, df: org.apache.spark.sql.DataFrame): Unit =
      println(s"STATSPROBE $tag sizeInBytes=" +
        df.queryExecution.optimizedPlan.stats.sizeInBytes)
    stat("documents", docs)
    val wrapped = graft.operators.Dedup.boilerplateWrapped(docs)
    stat("wrapped", wrapped)
    stat("shingles", graft.operators.Dedup.wordShinglesOf(wrapped))
    // q59's per-round join gate input (round 15): the distinct
    // (orderkey, partkey) projection the co-purchase edge build reads
    stat("q59_li", graft.sources.Tables.lineitem(spark, args(0))
      .select(org.apache.spark.sql.functions.col("l_orderkey"),
        org.apache.spark.sql.functions.col("l_partkey")).distinct())
    spark.stop()
  }
}
