package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT / codegen warm-up + FULL-COLUMN first-touch of every table: a
    // parquet count() is metadata-only, so the round-2 warm-up left the
    // big string/array columns (events.props, documents.text,
    // embeddings.embedding) cold and whichever query read them FIRST
    // absorbed the entire cold read — e03 measured 17s in-harness vs
    // 0.9s in a warm local loop. The noop-format write deserializes
    // every column once, making per-query numbers comparable across
    // invocation environments (BASELINE.md is recorded with this same
    // warm-up).
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.sources.Tables.names.foreach { t =>
      val df = if (t == "events") graft.sources.Tables.events(spark, sfDir)
               else spark.read.parquet(s"$sfDir/$t.parquet")
      df.write.mode("overwrite").format("noop").save()
    }
    // dev switch: iterate on the skew A/B without re-timing all queries
    val skewOnly = sys.env.contains("SPARK_GRAFT_SKEW_ONLY")
    val results = if (skewOnly) Seq.empty[(String, Double)]
    else SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // operators may persist() intermediates (d07); unpersist before the
      // next timed query so no entry benefits from or pays for another's cache
      spark.catalog.clearCache()
      name -> dt
    }
    // ─── skew A/B: plain vs salted sort-merge join on a hot key ────────
    // 90% of lineitem lands on one join key; AQE skew-split and
    // broadcast are disabled so the two entries isolate what manual
    // salting (operators.Skew) buys when neither rescue applies.
    val skewResults = {
      // ×5 row amplification so the hot key's single join task is the
      // measured cost (at sf0.1 the raw table's hot slice is small
      // enough that fixed per-query overhead would drown the signal)
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val large = li.select(col("l_orderkey"), col("l_extendedprice"))
        .withColumn("rep", explode(sequence(lit(1), lit(5))))
        .select(
          when(col("l_orderkey") % 100 < 90, 0L)
            .otherwise(col("l_orderkey") % 1000L).as("k"),
          (col("l_orderkey") * 5 + col("rep")).as("row_id"),
          col("l_extendedprice"))
      val small = spark.range(0, 1000)
        .select(col("id").as("k"), (col("id") * 7).as("attr"))
      def run(joined: DataFrame): Double = {
        val t0 = System.nanoTime()
        // per-row digest in the join stage: the hot task pays it 10×over
        // under skew, which is exactly what salting redistributes
        joined.agg(sum(length(sha2(
          concat_ws("_", col("row_id"), col("attr"), col("l_extendedprice")),
          512)))).collect()
        (System.nanoTime() - t0) / 1e9
      }
      val saved = (spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
        spark.conf.get("spark.sql.adaptive.skewJoin.enabled", "true"))
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      try Seq(
        "x01_skew_plain_join" -> run(large.join(small, Seq("k"))),
        "x02_skew_salted_join" -> run(graft.operators.Skew.saltedJoin(
          large, small, "k", col("row_id"), saltBuckets = cpus.toInt)))
      finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved._1)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", saved._2)
      }
    }
    // ─── bucket A/B: shuffled vs co-located bucketed sort-merge join ───
    // The payoff of pre-bucketing fact tables on their join key: the
    // bucketed pair joins with ZERO Exchange and ZERO Sort (SkewBucketSpec
    // asserts the plan); x03 is the same join + per-row digest work from
    // plain parquet, paying shuffle + sort on both sides. The one-time
    // bucketed write is untimed setup — it amortizes across every
    // downstream co-located join, the same build-once-use-many contract
    // as the IVF index.
    val bucketResults = {
      val wh = java.nio.file.Files.createTempDirectory("graft_bench_bucket").toString
      spark.sql("DROP TABLE IF EXISTS bench_b_orders")
      spark.sql("DROP TABLE IF EXISTS bench_b_lineitem")
      val o = spark.read.parquet(s"$sfDir/orders.parquet")
        .select(col("o_orderkey"), col("o_totalprice"))
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_linenumber"))
      o.write.option("path", s"$wh/o")
        .bucketBy(cpus.toInt, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("bench_b_orders")
      li.write.option("path", s"$wh/li")
        .bucketBy(cpus.toInt, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("bench_b_lineitem")
      def run(l: DataFrame, r: DataFrame): Double = {
        val t0 = System.nanoTime()
        l.join(r, col("l_orderkey") === col("o_orderkey"))
          .agg(sum(length(sha2(
            concat_ws("_", col("l_linenumber"), col("o_totalprice"), col("l_extendedprice")),
            512)))).collect()
        (System.nanoTime() - t0) / 1e9
      }
      val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try Seq(
        "x03_shuffle_smj" -> run(li, o),
        "x04_bucketed_smj" -> run(
          spark.table("bench_b_lineitem"), spark.table("bench_b_orders")))
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    }
    val all = results ++ skewResults ++ bucketResults
    val qs = all.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
