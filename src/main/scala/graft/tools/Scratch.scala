package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B harness for in-flight design measurements (not part of any
  * contract; contents change per experiment). Current experiment:
  * d33 phase split — candidate generation vs census vs array verify
  * (the round-15 verdict's top item: where do the 7.6 s go?).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // session warm-up
    def timed[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"SCRATCH $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); a
    }
    val dir = args(0)
    graft.sources.Tables.names.foreach { t =>
      val df = if (t == "events") graft.sources.Tables.events(spark, dir)
               else spark.read.parquet(s"$dir/$t.parquet")
      df.write.mode("overwrite").format("noop").save()
    }
    import graft.operators.Dedup
    (1 to 3).foreach { rep =>
      println(s"--- rep $rep ---")
      // phase split replicating containmentDedupOf over the wrapped corpus
      val docs = graft.sources.Tables.documents(spark, dir)
      val wrapped = Dedup.boilerplateWrapped(docs)
      val sh0 = Dedup.wordShinglesOf(wrapped)
      val sh = sh0.select(col("doc_id"),
        conv(substring(md5(col("shingle")), 1, 15), 16, 10).cast("long").as("gh"))
      val ranked = sh
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(col("gh"))).as("arr"))
        .select(col("doc_id"), size(col("arr")).cast("long").as("n"),
          posexplode(col("arr")).as(Seq("pos", "gh")))
        .select(col("doc_id"), col("n"), (col("pos") + 1).cast("long").as("rk"),
          col("gh"))
      timed("1 ranked (noop)") {
        ranked.write.mode("overwrite").format("noop").save()
      }
      val prefix = ranked.filter(col("rk") <= floor(col("n") / 5).cast("long") + 1)
      val pa = prefix.select(col("doc_id").as("doc_a"), col("gh"),
        col("n").as("na"), col("rk").as("ra"))
      val rb = ranked.select(col("doc_id").as("doc_b"), col("gh"),
        col("n").as("nb"), col("rk").as("rb"))
      val joinedRaw = pa.join(rb, Seq("gh"))
        .filter(col("doc_a") =!= col("doc_b") &&
          (col("na") < col("nb") || (col("na") === col("nb") && col("doc_a") < col("doc_b"))))
      val cand = joinedRaw
        .filter(lit(1) + least(col("na") - col("ra"), col("nb") - col("rb")) >=
          floor((lit(4) * col("na") + lit(4)) / 5).cast("long"))
        .select(col("doc_a"), col("doc_b")).distinct()
      timed("2 join output rows") {
        println("  joined(pre-pos-filter) rows=" + joinedRaw.count())
      }
      timed("3 cand distinct (noop)") {
        cand.write.mode("overwrite").format("noop").save()
      }
      val candP = cand.persist()
      timed("4 candP census action") {
        val row = candP
          .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
          .agg(count(lit(1)).as("two_np"),
            approx_count_distinct(col("doc_id")).as("nd")).collect()(0)
        println(s"  nPairs=${row.getLong(0) / 2} nDocs~${row.getLong(1)}")
      }
      val candDocs = candP.select(col("doc_a").as("doc_id"))
        .union(candP.select(col("doc_b").as("doc_id"))).distinct()
      val shCand = sh.join(broadcast(candDocs), Seq("doc_id"), "left_semi").persist()
      timed("5 shCand census") {
        val cRow = shCand.groupBy(col("gh")).agg(count(lit(1)).as("occ"))
          .agg(sum(col("occ")).as("tot"), sum(col("occ") * col("occ")).as("occ2"))
          .collect()(0)
        println(s"  tot=${cRow.getLong(0)} occ2=${cRow.getLong(1)}")
      }
      timed("6 full d33 row") {
        Dedup.hotShingleDedup(spark, dir).count()
      }
      graft.GraftSession.releaseQueryCaches(spark)
      timed("7 full d16 row") {
        Dedup.containmentDedup(spark, dir).count()
      }
      graft.GraftSession.releaseQueryCaches(spark)
      timed("8 full d35 row") {
        Dedup.slicedDedup(spark, dir).count()
      }
      graft.GraftSession.releaseQueryCaches(spark)
    }
    spark.stop()
  }
}
