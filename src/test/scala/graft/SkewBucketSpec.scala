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

  test("a dim filter prunes the partitioned fact at runtime (dynamic partition pruning)") {
    // the 100 TB star-join shape: the fact is partitioned on the join
    // key's column, the dim carries the selective filter, and Catalyst
    // must push a dynamicpruning subquery into the fact SCAN — only the
    // partitions the filtered dim admits are read, decided at runtime
    // from the dim's rows (static pruning can't see through the join)
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    val li = spark.read.parquet(s"${TestSpark.sf}/lineitem.parquet")
      .select(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"),
        col("l_extendedprice"))
    li.write.mode("overwrite").partitionBy("ship_month").parquet(s"$dir/fact")
    li.select(col("ship_month")).distinct()
      .withColumn("quarter",
        concat(substring(col("ship_month"), 1, 4), lit("-Q"),
          ((substring(col("ship_month"), 6, 2).cast("int") - 1) / 3 + 1).cast("string")))
      .write.mode("overwrite").parquet(s"$dir/dim")
    val fact = spark.read.parquet(s"$dir/fact")
    val dim = spark.read.parquet(s"$dir/dim")
    val q1 = dim.agg(min(col("quarter"))).collect().head.getString(0)
    val joined = fact.join(dim.filter(col("quarter") === q1), "ship_month")
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast("decimal(14,2)")).as("rev"))
    val p = joined.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamic partition pruning subquery on the fact scan:\n$p")
    // and the pruned join agrees with the direct month-list filter
    val months = dim.filter(col("quarter") === q1)
      .select("ship_month").collect().map(_.getString(0)).toSeq
    val direct = fact.filter(col("ship_month").isin(months: _*))
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast("decimal(14,2)")).as("rev"))
    assert(joined.collect().toSeq == direct.collect().toSeq)
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
