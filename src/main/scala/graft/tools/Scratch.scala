package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B harness for in-flight design measurements (not part of any
  * contract; contents change per experiment). Current experiment:
  * the d19 sf10 bend — per-stage wall-clock census of the shard-probe
  * pipeline (band compute / candidate join / verify) at given SFs,
  * after bucket-occupancy and banding-decision checks both read
  * linear/constant.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    args.foreach { sfDir =>
      val docs = graft.sources.Tables.documents(spark, sfDir)
      val isShard = pmod(col("doc_id"), lit(5L)) === 4
      val shard = docs.filter(isShard)
      // inline 3-gram shingles, dedup=false (the MinHash input shape)
      def shingles(d: DataFrame): DataFrame = d
        .select(col("doc_id"), regexp_extract_all(col("text"), lit("\\S+"), lit(0)).as("t"))
        .filter(size(col("t")) >= 3)
        .select(col("doc_id"), col("t"),
          explode(sequence(lit(1), size(col("t")) - 2)).as("i"))
        .select(col("doc_id"),
          concat_ws(" ",
            element_at(col("t"), col("i")),
            element_at(col("t"), col("i") + 1),
            element_at(col("t"), col("i") + 2)).as("shingle"))
      val (nb, nr) = graft.operators.Dedup.chosenBanding(spark, sfDir)
      val sfKey = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      def glob(p: String): String = {
        val fs = new org.apache.hadoop.fs.Path(p)
          .getFileSystem(spark.sessionState.newHadoopConf())
        fs.globStatus(new org.apache.hadoop.fs.Path(p)).head.getPath.toString
      }
      val bandsP = glob(s"$wh/lsh_bands/holdout5src${sfKey}_*_b${nb}r$nr")
      val setsP = glob(s"$wh/shingle_sets/holdout5src${sfKey}_*")
      val (shardBands, tBands) = timed {
        val b = graft.operators.Dedup
          .minhashBandsOf(shingles(shard), nb, nr).localCheckpoint()
        (b, b.count())
      }
      val corpusBands = spark.read.parquet(bandsP)
      val (cand, tCand) = timed {
        val all = corpusBands.union(shardBands._1)
        val c = shardBands._1.as("a").join(all.as("b"),
            col("a.band_j") === col("b.band_j") &&
              col("a.band_hash") === col("b.band_hash") &&
              col("a.doc_id") =!= col("b.doc_id"))
          .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
            greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
          .distinct().localCheckpoint()
        (c, c.count())
      }
      val (nVerify, tVerify) = timed {
        val candDocs = cand._1.select(col("doc_a").as("doc_id"))
          .union(cand._1.select(col("doc_b").as("doc_id"))).distinct()
        val corpusSide = spark.read.parquet(setsP)
          .select(col("doc_id"), col("sh_set").as("s"), col("n"))
          .join(broadcast(candDocs), Seq("doc_id"), "left_semi")
        val shardSide = shingles(shard)
          .join(broadcast(candDocs), Seq("doc_id"), "left_semi")
          .groupBy(col("doc_id")).agg(collect_set(col("shingle")).as("s"))
          .select(col("doc_id"), col("s"), size(col("s")).cast("long").as("n"))
        val shSets = corpusSide.unionByName(shardSide)
        val v = cand._1
          .join(shSets.select(col("doc_id").as("doc_a"), col("s").as("sa"), col("n").as("n_a")), Seq("doc_a"))
          .join(shSets.select(col("doc_id").as("doc_b"), col("s").as("sb"), col("n").as("n_b")), Seq("doc_b"))
          .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("long"))
          .filter(col("inter").cast("double") /
            (col("n_a") + col("n_b") - col("inter")).cast("double") >= 0.5)
        v.count()
      }
      println(s"D19CENSUS $sfDir banding=${nb}x$nr shardBandRows=${shardBands._2} " +
        f"tBands=$tBands%.2f candPairs=${cand._2} tCand=$tCand%.2f " +
        f"verified=$nVerify tVerify=$tVerify%.2f")
    }
    spark.stop()
  }
}
