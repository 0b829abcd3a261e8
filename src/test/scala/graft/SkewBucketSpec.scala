package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

class SkewBucketSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("salted join is semantically identical to the plain join") {
    val li = spark.read.parquet(s"${TestSpark.sf}/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_extendedprice", "l_linenumber")
    val p = spark.read.parquet(s"${TestSpark.sf}/part.parquet")
      .select(col("p_partkey").as("l_partkey"), col("p_type"))
    val plain = li.join(p, Seq("l_partkey"))
    val salted = Skew.saltedJoin(li, p, "l_partkey",
      saltFrom = col("l_orderkey") * 10 + col("l_linenumber"), saltBuckets = 8)
    assert(salted.count() == plain.count())
    // row-level equality
    assert(plain.exceptAll(salted.select(plain.columns.map(col): _*)).count() == 0)
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft_bucket").toString
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    val o = spark.read.parquet(s"${TestSpark.sf}/orders.parquet")
    val li = spark.read.parquet(s"${TestSpark.sf}/lineitem.parquet")
    o.write.option("path", s"$wh/b_orders")
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    li.write.option("path", s"$wh/b_lineitem")
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")
    // disable broadcast so the planner must pick the co-located SMJ path
    // (at real scale neither side broadcasts; this test models that)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_lineitem").join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      // co-located bucketed join: sort-merge with no Exchange on either side
      assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(joined.count() == li.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("month-partitioned layout prunes partitions and matches the flat scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val li = spark.read.parquet(s"${TestSpark.sf}/lineitem.parquet")
      .select(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"),
        col("l_extendedprice"), col("l_quantity"))
    li.write.mode("overwrite").parquet(s"$dir/flat")
    li.write.mode("overwrite").partitionBy("ship_month").parquet(s"$dir/bymonth")
    val month = li.agg(max(col("ship_month"))).collect().head.getString(0)
    def slice(path: String) =
      spark.read.parquet(path).filter(col("ship_month") === month)
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(14,2)")).as("rev"))
    // the partitioned read must carry the predicate as a PartitionFilter
    // (directory pruning at planning time), not a per-row data filter
    val p = slice(s"$dir/bymonth").queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(ship_month") ||
      "PartitionFilters: \\[.*ship_month".r.findFirstIn(p).isDefined,
      s"expected partition pruning in:\n$p")
    // and both layouts agree on the answer
    assert(slice(s"$dir/bymonth").collect().toSeq == slice(s"$dir/flat").collect().toSeq)
  }
}
