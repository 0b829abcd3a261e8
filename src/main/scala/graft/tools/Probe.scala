package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the dedup family (not part of the driver
  * contract): times candidate generation vs verification slice so perf
  * work targets the actual bottleneck.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up identical to Bench
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.sources.Tables.names.foreach { t =>
      val df = if (t == "events") graft.sources.Tables.events(spark, sfDir)
               else spark.read.parquet(s"$sfDir/$t.parquet")
      df.write.mode("overwrite").format("noop").save()
    }
    def time(name: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      f.write.mode("overwrite").format("noop").save()
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val shingles = docs
      .select(col("doc_id"), regexp_extract_all(col("text"), lit("\\S+"), lit(0)).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), col("t"), explode(sequence(lit(1), size(col("t")) - 2)).as("i"))
      .select(col("doc_id"), concat_ws(" ",
        element_at(col("t"), col("i")),
        element_at(col("t"), col("i") + 1),
        element_at(col("t"), col("i") + 2)).as("shingle"))
    time("shingle_explode")(shingles)
    val sigCols = (0 until 12).map(k =>
      min(md5(concat(lit(s"$k|"), col("shingle")))).as(s"sig_$k"))
    time("sig_12xmd5")(shingles.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*))
    // one md5 + arithmetic derivation (Kirsch–Mitzenmacher double hashing)
    val m = md5(col("shingle"))
    val h1 = conv(substring(m, 1, 15), 16, 10).cast("long")
    val h2 = conv(substring(m, 17, 14), 16, 10).cast("long")
    val kmCols = (0 until 12).map(k => min(h1 + lit(k.toLong) * h2).as(s"sig_$k"))
    time("sig_1xmd5_km")(shingles.groupBy(col("doc_id")).agg(kmCols.head, kmCols.tail: _*))
    time("d03_full")(graft.operators.Dedup.minhashLsh(spark, sfDir))
    time("d07_full")(graft.operators.Dedup.dedupPipeline(spark, sfDir))
    time("d08_full")(graft.operators.Dedup.contamination(spark, sfDir))
    time("d06_full")(graft.operators.Similarity.embeddingLsh(spark, sfDir))
    spark.stop()
  }
}
