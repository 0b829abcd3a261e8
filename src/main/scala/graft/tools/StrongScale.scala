package graft.tools

import org.apache.spark.sql.SparkSession

/** Strong-scaling measurement — the OTHER axis of the cluster claim:
  * fix the data (one sf directory), vary the core count, and report
  * each query's speedup curve. [[ScaleBench]] answers "does the work
  * grow linearly in the data?"; this answers "does the work actually
  * PARALLELIZE?" — a plan that hides a driver-side loop, a
  * single-partition window, or a serialized stage shows a flat curve
  * here no matter how linear its data scaling looks.
  *
  * Discipline matches ScaleBench: one session per core count
  * (`local[c]`, built and torn down sequentially in this JVM), solo
  * queries, rep 1 absorbs artifact builds / JIT, warm = min of the
  * remaining reps. `spark.sql.shuffle.partitions` stays FIXED at 32
  * across points so only executor parallelism varies — on a real
  * cluster the partition count scales with the cluster, but holding it
  * constant here isolates the question "can these 32 partitions be
  * consumed concurrently?", which is the property that transfers.
  *
  * Reported per query: warm seconds by core count, and the parallel
  * efficiency at the widest point,
  *   eff = (t_min_cores / t_max_cores) / (max_cores / min_cores)
  * (1.0 = perfect strong scaling; small queries degrade toward their
  * fixed overhead floor — read them by absolute time, not efficiency).
  *
  * Usage: runMain graft.tools.StrongScale <reps> <sfDir> <cores,cores,...> [-- names...]
  * Prints one JSON line (STRONGSCALE ...) consumed by SCALE.md.
  */
object StrongScale {

  def main(args: Array[String]): Unit = {
    val reps = args(0).toInt
    val sfDir = args(1)
    val (coreArg, nameArgs) = args.drop(2).span(_ != "--")
    val cores = coreArg.head.split(",").map(_.trim.toInt).toSeq.sorted
    require(cores.size >= 2, "need at least two core counts")
    val names =
      if (nameArgs.length > 1) nameArgs.drop(1).toSeq
      else ScaleBench.defaultNames

    def measure(c: Int): Map[String, (Double, Double)] = {
      val spark = SparkSession.builder()
        .master(s"local[$c]")
        .config("spark.sql.shuffle.partitions", 32)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.window.WindowExec",
        org.apache.logging.log4j.Level.ERROR)
      try {
        spark.range(1000000).selectExpr("sum(id)").collect()
        graft.sources.Tables.names.foreach { t =>
          val df = if (t == "events") graft.sources.Tables.events(spark, sfDir)
                   else spark.read.parquet(s"$sfDir/$t.parquet")
          df.write.mode("overwrite").format("noop").save()
        }
        names.map { name =>
          val times = (1 to reps).map { _ =>
            val t0 = System.nanoTime()
            graft.SparkEntry.queries(name)(spark, sfDir).count()
            spark.catalog.clearCache()
            (System.nanoTime() - t0) / 1e9
          }
          val warm = if (times.size > 1) times.tail.min else times.head
          println(f"STRONGTIME local[$c] $name cold=${times.head}%.3f warm=$warm%.3f")
          name -> (times.head, warm)
        }.toMap
      } finally spark.stop()
    }

    val measured: Seq[(Int, Map[String, (Double, Double)])] =
      cores.map(c => c -> measure(c))
    val (cLo, lo) = measured.head
    val (cHi, hi) = measured.last
    val entries = names.map { n =>
      val byCores = measured.map { case (c, m) =>
        f""""$c":{"cold":${m(n)._1}%.3f,"warm":${m(n)._2}%.3f}"""
      }
      val speedup = lo(n)._2 / hi(n)._2
      val eff = speedup / (cHi.toDouble / cLo)
      s""""$n":{"by_cores":{${byCores.mkString(",")}},""" +
        f""""speedup_${cLo}to$cHi":$speedup%.2f,"efficiency":$eff%.2f}"""
    }
    println(s"""STRONGSCALE {"metric":"strong_scaling","sf_dir":"$sfDir",""" +
      s""""cores":[${cores.mkString(",")}],"queries":{${entries.mkString(",")}}}""")
  }
}
