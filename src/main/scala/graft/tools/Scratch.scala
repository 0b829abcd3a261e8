package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B harness for in-flight design measurements (not part of any
  * contract; contents change per experiment). Current experiment:
  * q53's map-side pair explosion vs the rejected (order, brand)
  * self-join — times AND shuffle volume, because at single-box scale
  * the volume asymmetry (7.5× records) is the signal while wall-clock
  * converges. Numbers recorded at Analytics2.basketAffinity.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    val pt = spark.read.parquet(s"$sfDir/part.parquet")
      .select(col("p_partkey"), col("p_brand"))
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def selfJoin(): Unit = {
      val oc = li.join(pt, col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("k"), col("p_brand")).distinct()
      val n = oc.as("a").join(oc.as("b"),
          col("a.k") === col("b.k") && col("a.p_brand") < col("b.p_brand"))
        .groupBy(col("a.p_brand"), col("b.p_brand"))
        .agg(count(lit(1)).as("c")).count()
      require(n > 0)
    }
    def mapSide(): Unit = {
      val n = li.join(pt, col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("p_brand"))).as("brands"))
        .select(explode(expr(
          """flatten(transform(brands,
            |  (x, i) -> transform(slice(brands, i + 2, size(brands)),
            |            y -> struct(x AS a, y AS b))))""".stripMargin)).as("pr"))
        .groupBy(col("pr.a"), col("pr.b")).agg(count(lit(1)).as("c")).count()
      require(n > 0)
    }
    @volatile var shuffleWrite = 0L
    @volatile var shuffleRecords = 0L
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        if (t.taskMetrics != null) {
          shuffleWrite += t.taskMetrics.shuffleWriteMetrics.bytesWritten
          shuffleRecords += t.taskMetrics.shuffleWriteMetrics.recordsWritten
        }
      }
    })
    def measured(label: String)(f: => Unit): Unit = {
      shuffleWrite = 0L; shuffleRecords = 0L
      val s = timed(f)
      Thread.sleep(1500) // let the listener bus drain
      println(f"SCRATCH $label $s%.3f s shuffle=${shuffleWrite / 1024 / 1024}%d MiB records=$shuffleRecords%d")
    }
    (1 to 3).foreach { _ =>
      measured("selfjoin")(selfJoin())
      measured("mapside ")(mapSide())
    }
    spark.stop()
  }
}
