package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-factor amplifier for the test corpus: produce an N× dataset
  * from an existing sf directory by replicating every table with
  * disjoint key spaces, so the SCALING MEASUREMENT (tools.ScaleBench)
  * has a larger corpus whose per-replica workload profile is exactly
  * the source's.
  *
  * Replication is designed so the TRUE work scales linearly by
  * construction — the measurement then isolates how the ENGINE scales:
  *
  *  - every key column shifts by `replica × (max_key + 1)` — replicas
  *    never join across, so join/group cardinalities per replica stay
  *    identical to the source;
  *  - document text gets a per-replica token suffix (`tok~rK`), a
  *    BIJECTIVE token mapping: shingle equality inside a replica is
  *    preserved exactly (the near-dup structure is the source's), while
  *    cross-replica vocabularies are disjoint — no shingle, MinHash
  *    band, 13-gram, or SimHash profile ever collides across replicas,
  *    so dedup candidate counts scale exactly ×N, not ×N²;
  *  - embeddings rotate their dimensions by `replica` positions — a
  *    permutation preserves all within-replica dot products and norms
  *    (identical cluster geometry per replica) while cross-replica
  *    cosines decorrelate, so ANN/SemDeDup cell structure scales as N
  *    independent copies;
  *  - nation/region (bounded dims) and every date/category/segment
  *    domain stay UNreplicated — at 100 TB the dimension tables and
  *    group-by domains don't grow with the fact volume, and neither
  *    should the benchmark's.
  *
  * Usage: runMain graft.tools.ScaleGen <srcDir> <outDir> <factor>
  */
object ScaleGen {

  private def maxOf(df: DataFrame, c: String): Long =
    df.agg(max(col(c))).collect().head.getLong(0)

  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, factorS) = args.take(3)
    val factor = factorS.toInt
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.Tables

    val orderStride = maxOf(Tables.orders(spark, srcDir), "o_orderkey") + 1
    val custStride = maxOf(Tables.customer(spark, srcDir), "c_custkey") + 1
    val partStride = maxOf(Tables.part(spark, srcDir), "p_partkey") + 1
    val suppStride = maxOf(Tables.supplier(spark, srcDir), "s_suppkey") + 1
    val docStride = maxOf(Tables.documents(spark, srcDir), "doc_id") + 1
    val vecStride = maxOf(Tables.embeddings(spark, srcDir), "vec_id") + 1
    val eventStride = maxOf(Tables.events(spark, srcDir), "event_id") + 1
    val userStride = maxOf(Tables.events(spark, srcDir), "user_id") + 1
    val dim = Tables.embeddings(spark, srcDir)
      .select(size(col("embedding"))).head().getInt(0)

    def shifted(df: DataFrame, shifts: Map[String, Long])(r: Int): DataFrame =
      shifts.foldLeft(df) { case (d, (c, stride)) =>
        d.withColumn(c, col(c) + lit(r.toLong * stride))
      }

    // File counts are sized so the SCAN never caps parallelism on the
    // measurement box: with ~1 MB files each file is one input split,
    // so a 16-file table pins every pre-shuffle stage (shingling,
    // MinHash, embedding math — the CPU-heavy legs) at 16-way whatever
    // local[c] says. That's a generator artifact, not a plan property
    // (a real 100 TB table is thousands of splits) — the round-9
    // strong-scaling record flattening on d19/d07 at 16→32 cores is
    // what exposed it. 64 files for the fact-sized tables keeps 2
    // waves at local[32] while staying well clear of the
    // small-files regime.
    def replicate(name: String, mk: Int => DataFrame, files: Int): Unit = {
      val out = (0 until factor).map(mk).reduce(_ unionAll _)
      out.repartition(files).write.mode("overwrite")
        .parquet(s"$outDir/$name.parquet")
      println(s"SCALEGEN $name x$factor -> $outDir/$name.parquet")
    }

    // bounded dims: one copy
    spark.read.parquet(s"$srcDir/region.parquet").write.mode("overwrite")
      .parquet(s"$outDir/region.parquet")
    spark.read.parquet(s"$srcDir/nation.parquet").write.mode("overwrite")
      .parquet(s"$outDir/nation.parquet")

    replicate("customer",
      shifted(Tables.customer(spark, srcDir), Map("c_custkey" -> custStride)),
      8)
    replicate("supplier",
      shifted(Tables.supplier(spark, srcDir), Map("s_suppkey" -> suppStride)),
      4)
    replicate("part",
      shifted(Tables.part(spark, srcDir), Map("p_partkey" -> partStride)),
      8)
    replicate("orders",
      shifted(Tables.orders(spark, srcDir),
        Map("o_orderkey" -> orderStride, "o_custkey" -> custStride)),
      32)
    replicate("lineitem",
      shifted(Tables.lineitem(spark, srcDir),
        Map("l_orderkey" -> orderStride, "l_partkey" -> partStride,
          "l_suppkey" -> suppStride)),
      64)
    replicate("events",
      shifted(Tables.events(spark, srcDir),
        Map("event_id" -> eventStride, "user_id" -> userStride)),
      64)
    replicate("documents", { r =>
      val base = Tables.documents(spark, srcDir)
        .withColumn("doc_id", col("doc_id") + lit(r.toLong * docStride))
      if (r == 0) base
      else base
        .withColumn("text",
          regexp_replace(col("text"), "(\\S+)", "$1~r" + r))
        .withColumn("n_chars", length(col("text")))
    }, 64)
    replicate("embeddings", { r =>
      val base = Tables.embeddings(spark, srcDir)
        .withColumn("vec_id", col("vec_id") + lit(r.toLong * vecStride))
      val rot = r % dim
      if (rot == 0) base
      else base.withColumn("embedding",
        concat(
          slice(col("embedding"), rot + 1, dim - rot),
          slice(col("embedding"), 1, rot)))
    }, 64)

    spark.stop()
  }
}
