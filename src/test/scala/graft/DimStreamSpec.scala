package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scd2
import graft.streaming.DimStream

object DimStreamSpec {
  /** One dim update on the CDC stream: key, attr snapshot, row hash,
    * and the log sequence number that orders updates within a batch. */
  case class Upd(id: Long, attr: String, row_hash: String, seq: Long)
}

class DimStreamSpec extends AnyFunSuite {
  import DimStreamSpec.Upd
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val far = "9999-12-31 00:00:00"
  private def ts(s: String) = lit(s).cast("timestamp")
  private def mergeTsOf(batchId: Long) =
    ts(f"2021-01-0${batchId + 1}%d 00:00:00")

  private def initDim(path: String): Unit =
    Seq((1L, "A", 1L, true, "hA"), (2L, "B", 1L, true, "hB"))
      .toDF("id", "attr", "version", "is_current", "row_hash")
      .withColumn("effective_start_date", ts("2020-01-01 00:00:00"))
      .withColumn("effective_end_date", ts(far))
      .withColumn("change_type", lit("new"))
      .write.mode("overwrite").parquet(path)

  private def sortedRows(df: DataFrame) =
    df.select("id", "attr", "version", "is_current", "effective_start_date",
        "effective_end_date", "row_hash")
      .collect().map(_.toSeq).sortBy(_.toString)

  test("streamed SCD2 merges equal the sequential batch merges row-for-row") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_dimstream").toString
    val streamPath = s"$dir/dim_stream"
    val batchPath = s"$dir/dim_batch"
    initDim(streamPath)
    initDim(batchPath)

    // batch 0: change key 1, add key 3; batch 1: change key 1 again
    // (second version bump), re-send key 2 unchanged. Batch 0 also
    // carries TWO updates for key 1 — the last (seq-ordered) must win.
    val b0 = Seq(Upd(1L, "A_mid", "hAm", 10L), Upd(1L, "A2", "hA2", 11L),
      Upd(3L, "C", "hC", 12L))
    val b1 = Seq(Upd(1L, "A3", "hA3", 20L), Upd(2L, "B", "hB", 21L))

    val src = MemoryStream[Upd]
    val q = DimStream.scd2Sink(src.toDF(), streamPath, "id", "seq", mergeTsOf)
      .start()
    try {
      src.addData(b0: _*); q.processAllAvailable()
      src.addData(b1: _*); q.processAllAvailable()
    } finally q.stop()

    // the batch twin: the same two merges applied sequentially
    Seq(b0, b1).zipWithIndex.foreach { case (b, i) =>
      val snap = DimStream.lastPerKey(b.toDF(), "id", "seq")
      Scd2.mergeInto(spark, batchPath, snap, "id", mergeTsOf(i.toLong))
    }

    val streamed = spark.read.parquet(streamPath)
    val batched = spark.read.parquet(batchPath)
    assert(sortedRows(streamed).toSeq == sortedRows(batched).toSeq)

    // key 1 accrued three versions (initial + two stream changes), one current
    val k1 = streamed.filter(col("id") === 1).collect()
    assert(k1.length == 3)
    assert(k1.count(_.getAs[Boolean]("is_current")) == 1)
    val cur = k1.find(_.getAs[Boolean]("is_current")).get
    assert(cur.getAs[String]("attr") == "A3" && cur.getAs[Long]("version") == 3L)
    // the mid-batch update never became a version: last-per-key won
    assert(!k1.map(_.getAs[String]("attr")).contains("A_mid"))
    // unchanged re-send did not bump key 2
    assert(streamed.filter(col("id") === 2).count() == 1)
  }

  test("replaying a batch is absorbed by row_hash change detection (idempotent sink)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dimreplay").toString
    val path = s"$dir/dim"
    initDim(path)
    val b = Seq(Upd(1L, "A2", "hA2", 10L), Upd(3L, "C", "hC", 11L))
    val snap = DimStream.lastPerKey(b.toDF(), "id", "seq")
    Scd2.mergeInto(spark, path, snap, "id", mergeTsOf(0))
    val once = sortedRows(spark.read.parquet(path)).toSeq
    // at-least-once delivery: the same batch id re-merges identically
    Scd2.mergeInto(spark, path, snap, "id", mergeTsOf(0))
    assert(sortedRows(spark.read.parquet(path)).toSeq == once)
  }
}
