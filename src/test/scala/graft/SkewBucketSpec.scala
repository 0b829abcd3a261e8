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
}
