package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.FactStream
import graft.streaming.FactStream.LineitemEvent

/** The streaming fact ingest must land EXACTLY the rows the batch
  * build derives — same joins, same derived columns, same month
  * partitioning — across multiple micro-batches that revisit the same
  * month partitions (the file sink's exactly-once commit is the
  * property under test; a re-delivered batch double-counting would
  * break row identity).
  */
class FactStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streamed fact == batch fact over multi-batch ingest into shared partitions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val li = graft.sources.Tables.lineitem(spark, TestSpark.sf)
      .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"))
      .as[LineitemEvent].collect().toSeq
    assert(li.nonEmpty)
    val orders = graft.sources.Tables.orders(spark, TestSpark.sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val part = graft.sources.Tables.part(spark, TestSpark.sf)
      .select(col("p_partkey"), col("p_type"))

    val src = MemoryStream[LineitemEvent]
    val out = java.nio.file.Files.createTempDirectory("graft_fact_stream").toString
    val q = FactStream.run(
      FactStream.factStream(src.toDF(), orders, part),
      s"$out/fact", s"$out/ckpt")
    try {
      // three chunks split by orderkey — NOT by date, so every chunk
      // holds rows of many months and later batches append into month
      // partitions earlier batches already created
      li.grouped((li.size + 2) / 3).foreach { chunk =>
        src.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark.read.parquet(s"$out/fact").drop("month_key")
    val batch = graft.operators.Facts.factSalesFrom(
      li.toDF(), orders, part)
    assert(streamed.count() == li.size.toLong)
    assert(streamed.except(batch).count() == 0 &&
      batch.except(streamed).count() == 0,
      "stream and batch facts must be row-identical")
    // month partitions exist and a partition read prunes
    val months = spark.read.parquet(s"$out/fact")
      .select("month_key").distinct().count()
    assert(months > 10, s"expected many month partitions, got $months")
  }
}
