package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object Bench {

  /** One query's repeated timings: successful wall times + error
    * messages from failed reps. A failed rep NEVER contributes a
    * normal-looking number — the silent `catch → -1` of earlier rounds
    * let a broken query hide as a fast time.
    */
  private[graft] case class Timing(ok: Seq[Double], errors: Seq[String]) {
    def median: Double =
      if (ok.isEmpty) -1.0
      else ok.sorted.apply((ok.size - 1) / 2)
    def max: Double = if (ok.isEmpty) -1.0 else ok.max
  }

  private def loadAvg(): Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0).toDouble
    catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val load0 = loadAvg()
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

    def timed(body: => Unit): Either[String, Double] = {
      val t0 = System.nanoTime()
      try { body; Right((System.nanoTime() - t0) / 1e9) }
      catch { case e: Throwable =>
        Left(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
      }
    }

    // ─── headline queries: `reps` INTERLEAVED full passes ──────────────
    // Per-query median over interleaved passes, so a transient machine-
    // load spike inflates ONE rep of many queries (medians unaffected)
    // instead of every rep of a few — one contended window can no longer
    // set the official number, which is how BENCH_r03 read 3× baseline
    // on untouched queries.
    val names = SparkEntry.queries.keys.toSeq.sorted
    val results: Map[String, Timing] = if (skewOnly) Map.empty
    else {
      val runs = (1 to reps).flatMap { _ =>
        names.map { name =>
          val r = timed(SparkEntry.queries(name)(spark, sfDir).count())
          // operators may persist() intermediates; unpersist before the
          // next timed query so no entry benefits from or pays for
          // another's cache
          spark.catalog.clearCache()
          name -> r
        }
      }
      runs.groupBy(_._1).map { case (name, rs) =>
        name -> Timing(rs.collect { case (_, Right(t)) => t },
                       rs.collect { case (_, Left(e)) => e })
      }
    }

    // ─── skew A/B: plain vs salted sort-merge join on a hot key ────────
    // 90% of lineitem lands on one join key; AQE skew-split and
    // broadcast are disabled so the two entries isolate what manual
    // salting (operators.Skew) buys when neither rescue applies.
    val skewResults: Seq[(String, Timing)] = {
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
      def run(joined: => DataFrame): Either[String, Double] = timed {
        // per-row digest in the join stage: the hot task pays it 10×over
        // under skew, which is exactly what salting redistributes
        joined.agg(sum(length(sha2(
          concat_ws("_", col("row_id"), col("attr"), col("l_extendedprice")),
          512)))).collect()
      }
      val saved = (spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
        spark.conf.get("spark.sql.adaptive.skewJoin.enabled", "true"))
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      try {
        val runs = (1 to reps).flatMap { _ => Seq(
          "x01_skew_plain_join" -> run(large.join(small, Seq("k"))),
          "x02_skew_salted_join" -> run(graft.operators.Skew.saltedJoin(
            large, small, "k", col("row_id"), saltBuckets = cpus.toInt)))
        }
        runs.groupBy(_._1).toSeq.map { case (name, rs) =>
          name -> Timing(rs.collect { case (_, Right(t)) => t },
                         rs.collect { case (_, Left(e)) => e })
        }
      } finally {
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
    val bucketResults: Seq[(String, Timing)] = {
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
      def run(l: DataFrame, r: DataFrame): Either[String, Double] = timed {
        l.join(r, col("l_orderkey") === col("o_orderkey"))
          .agg(sum(length(sha2(
            concat_ws("_", col("l_linenumber"), col("o_totalprice"), col("l_extendedprice")),
            512)))).collect()
      }
      val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val runs = (1 to reps).flatMap { _ => Seq(
          "x03_shuffle_smj" -> run(li, o),
          "x04_bucketed_smj" -> run(
            spark.table("bench_b_lineitem"), spark.table("bench_b_orders")))
        }
        runs.groupBy(_._1).toSeq.map { case (name, rs) =>
          name -> Timing(rs.collect { case (_, Right(t)) => t },
                         rs.collect { case (_, Left(e)) => e })
        }
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    }
    // ─── x05: IVF index build WITHOUT artifact writes ──────────────────
    // q24's timed entry publishes codebook + assignment (its contract);
    // this entry times the pure k-means computation so the index-BUILD
    // number is comparable round-over-round independent of write cost.
    val ivfCompute: Seq[(String, Timing)] = if (skewOnly) Seq.empty else {
      val runs = (1 to reps).map { _ =>
        val r = timed(graft.operators.Similarity.ivfAssign(spark, sfDir).count())
        spark.catalog.clearCache()
        r
      }
      Seq("x05_ivf_compute" -> Timing(runs.collect { case Right(t) => t },
                                      runs.collect { case Left(e) => e }))
    }

    val load1 = loadAvg()
    val all = results.toSeq ++ skewResults ++ bucketResults ++ ivfCompute
    def jmap(f: Timing => Double): String =
      all.sortBy(_._1).map { case (k, t) => s"\"" + k + "\":" + f(t) }
        .mkString("{", ",", "}")
    def jesc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"
                  case c if c < ' ' => " "; case c => c.toString }
    val errs = all.filter(_._2.errors.nonEmpty).sortBy(_._1)
      .map { case (k, t) => s"\"" + k + "\":\"" + jesc(t.errors.head) + "\"" }
      .mkString("{", ",", "}")
    val total = results.values.map(_.median).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${jmap(_.median)},"query_max":${jmap(_.max)},"errors":$errs,"reps":$reps,"load_before":$load0,"load_after":$load1,"sf":"$sfDir"}""")
    spark.stop()
  }
}
