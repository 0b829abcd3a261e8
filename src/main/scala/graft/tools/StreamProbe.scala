package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Dev-only phase profiler for the stream_* wrapper rows (not part of
  * the driver contract): times staging vs drain vs read-back so the
  * wrapper optimization targets the real cost.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.names.foreach { t =>
      val df = if (t == "events") Tables.events(spark, dir)
               else spark.read.parquet(s"$dir/$t.parquet")
      df.write.mode("overwrite").format("noop").save()
    }
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SPROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      val out = Files.createTempDirectory("sprobe").toString
      val schema = time("stage lineitem 3-split") {
        val tmp = Paths.get(out, "src/_stage")
        val li = Tables.lineitem(spark, dir)
        li.repartition(3, col("l_orderkey"))
          .write.mode("overwrite").parquet(tmp.toString)
        val parts = {
          val s = Files.list(tmp)
          try s.filter(f => f.getFileName.toString.startsWith("part-") &&
              f.getFileName.toString.endsWith(".parquet"))
            .sorted().toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
          finally s.close()
        }
        parts.zipWithIndex.foreach { case (part, i) =>
          val target = Paths.get(out, f"src/chunk$i%03d.parquet")
          Files.move(part, target)
          Files.setLastModifiedTime(target,
            java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 10000L))
        }
        li.schema
      }
      val orders = time("orders persist")(
        { val o = Tables.orders(spark, dir).persist()
          o.write.format("noop").mode("overwrite").save(); o })
      val part = time("part persist")(
        { val p = Tables.part(spark, dir).persist()
          p.write.format("noop").mode("overwrite").save(); p })
      time("drain 3 batches") {
        val fact = graft.streaming.FactStream.factStream(
          spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
            .parquet(s"$out/src"), orders, part)
        val q = fact.writeStream.format("parquet")
          .option("path", s"$out/sink").option("checkpointLocation", s"$out/ckpt")
          .partitionBy("month_key").outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      }
      time("read-back count") {
        spark.read.parquet(s"$out/sink").count()
      }
      time("drain 3 batches month-rep") {
        val fact = graft.streaming.FactStream.factStream(
          spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
            .parquet(s"$out/src"), orders, part)
          .repartition(col("month_key"))
        val q = fact.writeStream.format("parquet")
          .option("path", s"$out/sink2").option("checkpointLocation", s"$out/ckpt2")
          .partitionBy("month_key").outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      }
      time("drain 3 batches spread+month") {
        val fact = graft.streaming.FactStream.factStream(
          spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
            .parquet(s"$out/src").repartition(16), orders, part)
          .repartition(col("month_key"))
        val q = fact.writeStream.format("parquet")
          .option("path", s"$out/sink3").option("checkpointLocation", s"$out/ckpt3")
          .partitionBy("month_key").outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      }
      time("drain 3 batches spread-only") {
        val fact = graft.streaming.FactStream.factStream(
          spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
            .parquet(s"$out/src").repartition(16), orders, part)
        val q = fact.writeStream.format("parquet")
          .option("path", s"$out/sink4").option("checkpointLocation", s"$out/ckpt4")
          .partitionBy("month_key").outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      }
      orders.unpersist(); part.unpersist()
      graft.GraftSession.releaseQueryCaches(spark)
    }
    spark.stop()
  }
}
