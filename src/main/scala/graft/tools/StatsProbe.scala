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
    spark.stop()
  }
}
