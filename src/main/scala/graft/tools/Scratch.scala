package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B harness for in-flight design measurements (not part of any
  * contract; contents change per experiment). Current experiment:
  * the d16 sf10 blowup — per-stage cardinality census of the
  * containment-dedup pipeline at two SFs, to locate which term grows
  * superlinearly (the 320-partition rerun already falsified the
  * spill-from-pinned-partitions hypothesis).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { sfDir =>
      // inline 3-gram set shingles (the wordShingles(dedup=true) shape)
      val sh = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), regexp_extract_all(col("text"), lit("\\S+"), lit(0)).as("t"))
        .filter(size(col("t")) >= 3)
        .select(col("doc_id"), col("t"),
          explode(sequence(lit(1), size(col("t")) - 2)).as("i"))
        .select(col("doc_id"),
          concat_ws(" ",
            element_at(col("t"), col("i")),
            element_at(col("t"), col("i") + 1),
            element_at(col("t"), col("i") + 2)).as("shingle"))
        .distinct()
      val ranked = sh
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(md5(col("shingle")).as("h"),
          col("shingle").as("shingle")))).as("arr"))
        .select(col("doc_id"), size(col("arr")).cast("long").as("n"),
          posexplode(col("arr")).as(Seq("pos", "s")))
        .select(col("doc_id"), col("n"), (col("pos") + 1).cast("long").as("rk"),
          col("s.shingle").as("shingle"))
        .persist()
      val prefix = ranked.filter(col("rk") <= floor(col("n") / 5).cast("long") + 1)
      val joined = prefix
        .select(col("doc_id").as("doc_a"), col("shingle"), col("n").as("na"), col("rk").as("ra"))
        .join(ranked.select(col("doc_id").as("doc_b"), col("shingle"),
          col("n").as("nb"), col("rk").as("rb")), Seq("shingle"))
        .filter(col("doc_a") =!= col("doc_b") &&
          (col("na") < col("nb") || (col("na") === col("nb") && col("doc_a") < col("doc_b"))))
      val posFiltered = joined.filter(
        lit(1) + least(col("na") - col("ra"), col("nb") - col("rb")) >=
          floor((lit(4) * col("na") + lit(4)) / 5).cast("long"))
      val nShingle = ranked.count()
      val nPrefix = prefix.count()
      val nJoin = joined.count()
      val nPos = posFiltered.count()
      val nCand = posFiltered.select(col("doc_a"), col("doc_b")).distinct().count()
      // hot-shingle profile: the join output is sum over shingles of
      // prefixOcc * totalOcc — the top of that distribution is the tell
      val hot = prefix.groupBy(col("shingle")).agg(count(lit(1)).as("p"))
        .join(ranked.groupBy(col("shingle")).agg(count(lit(1)).as("t")), Seq("shingle"))
        .select((col("p") * col("t")).as("contrib"))
        .agg(sum(col("contrib")).as("sum"), max(col("contrib")).as("max"))
        .head()
      println(s"D16CENSUS $sfDir shingleRows=$nShingle prefixRows=$nPrefix " +
        s"joinOut=$nJoin posFiltered=$nPos candPairs=$nCand " +
        s"contribSum=${hot.getLong(0)} contribMax=${hot.getLong(1)}")
      ranked.unpersist()
    }
    spark.stop()
  }
}
