package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scd2

class Scd2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val far = "9999-12-31 00:00:00"
  private def ts(s: String) = lit(s).cast("timestamp")

  test("merge expires changed, inserts new, keeps history and unchanged") {
    val existing = Seq(
      // key, attr, version, is_current, start, end, hash
      (1L, "A", 1L, true, "2020-01-01 00:00:00", far, "hA"),
      (1L, "Z", 0L, false, "2019-01-01 00:00:00", "2020-01-01 00:00:00", "hZ"), // history
      (2L, "B", 1L, true, "2020-01-01 00:00:00", far, "hB"),
      (3L, "C", 1L, true, "2020-01-01 00:00:00", far, "hC"))
      .toDF("id", "attr", "version", "is_current", "start_s", "end_s", "row_hash")
      .withColumn("effective_start_date", col("start_s").cast("timestamp"))
      .withColumn("effective_end_date", col("end_s").cast("timestamp"))
      .drop("start_s", "end_s")
    val incoming = Seq(
      (1L, "A", "hA"),   // unchanged
      (2L, "B2", "hB2"), // changed
      (4L, "D", "hD"))   // new  (3 absent from batch)
      .toDF("id", "attr", "row_hash")

    val out = Scd2.merge(existing, incoming, "id", ts("2021-01-01 00:00:00"))
    val byType = out.groupBy("change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("history" -> 1L, "unchanged" -> 2L, "expired" -> 1L,
      "changed" -> 1L, "new" -> 1L))

    val v2 = out.filter(col("id") === 2 && col("is_current")).collect()
    assert(v2.length == 1)
    val row = v2.head
    assert(row.getAs[String]("attr") == "B2")
    assert(row.getAs[Long]("version") == 2L)
    val expired = out.filter(col("id") === 2 && !col("is_current")).collect().head
    assert(expired.getAs[java.sql.Timestamp]("effective_end_date").toString.startsWith("2021-01-01"))

    // exactly one current row per key
    val dupCurrent = out.filter(col("is_current"))
      .groupBy("id").count().filter(col("count") > 1).count()
    assert(dupCurrent == 0)
  }

  test("null row_hash on a matched key stays on the unchanged/changed branches") {
    val existing = Seq(
      (1L, "A", 1L, true, Option.empty[String]), // cur hash NULL
      (2L, "B", 1L, true, Option("hB")))
      .toDF("id", "attr", "version", "is_current", "row_hash")
      .withColumn("effective_start_date", ts("2020-01-01 00:00:00"))
      .withColumn("effective_end_date", ts(far))
    val incoming = Seq(
      (1L, "A", Option.empty[String]), // both NULL → unchanged, not 'new'
      (2L, "B2", Option.empty[String]))// hB vs NULL → a real change
      .toDF("id", "attr", "row_hash")
    val out = Scd2.merge(existing, incoming, "id", ts("2021-01-01 00:00:00"))
    val byType = out.groupBy("change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("unchanged" -> 1L, "expired" -> 1L, "changed" -> 1L))
    // no key ever loses its current row or resets to version 1
    assert(out.filter(col("is_current")).count() == 2)
    assert(out.filter(col("id") === 2 && col("is_current"))
      .collect().head.getAs[Long]("version") == 2L)
  }

  test("mergeInto re-runs batch merges against a parquet dim path") {
    val path = java.nio.file.Files.createTempDirectory("graft_scd2").toString + "/dim"
    Seq((1L, "A", 1L, true, "hA"), (2L, "B", 1L, true, "hB"))
      .toDF("id", "attr", "version", "is_current", "row_hash")
      .withColumn("effective_start_date", ts("2020-01-01 00:00:00"))
      .withColumn("effective_end_date", ts(far))
      .withColumn("change_type", lit("new"))
      .write.parquet(path)
    // batch 1: id=2 changes
    val n1 = Scd2.mergeInto(spark, path,
      Seq((1L, "A", "hA"), (2L, "B2", "hB2")).toDF("id", "attr", "row_hash"),
      "id", ts("2021-01-01 00:00:00"))
    assert(n1 == 3) // 1 unchanged + expired + changed
    // batch 2 on the PUBLISHED result: id=1 changes, id=3 arrives
    val n2 = Scd2.mergeInto(spark, path,
      Seq((1L, "A9", "hA9"), (2L, "B2", "hB2"), (3L, "C", "hC")).toDF("id", "attr", "row_hash"),
      "id", ts("2022-01-01 00:00:00"))
    assert(n2 == 5) // id2's history row + id1 expired + id1 changed + id2 unchanged + id3 new
    val dim = spark.read.parquet(path)
    assert(dim.filter(col("is_current")).count() == 3)
    val cur1 = dim.filter(col("id") === 1 && col("is_current")).collect().head
    assert(cur1.getAs[String]("attr") == "A9" && cur1.getAs[Long]("version") == 2L)
    // full lineage for id=1: expired v1 + current v2
    assert(dim.filter(col("id") === 1).count() == 2)
  }

  test("multi-batch merge matches a brute-force SCD2 reference on randomized batches") {
    // reference state machine: per key, a current version plus expired
    // history; change detected by row_hash, version increments, expired
    // rows close at the batch timestamp
    case class V(k: Long, a: String, version: Long, current: Boolean,
                 startDay: Int, endDay: Int) // endDay 99 = far future
    val rnd = new scala.util.Random(7)
    var state = Map.empty[Long, List[V]]
    def applyRef(batch: Seq[(Long, String)], day: Int): Unit =
      batch.foreach { case (k, a) =>
        state.get(k) match {
          case None => state += k -> List(V(k, a, 1L, true, day, 99))
          case Some(vs) =>
            val cur = vs.find(_.current).get
            if (cur.a != a) {
              val expired = cur.copy(current = false, endDay = day)
              state += k -> (V(k, a, cur.version + 1, true, day, 99) ::
                expired :: vs.filterNot(_.current))
            }
        }
      }

    var dim = Seq.empty[(Long, String, Long, Boolean, String)]
      .toDF("id", "attr", "version", "is_current", "row_hash")
      .withColumn("effective_start_date", ts("2024-01-01 00:00:00"))
      .withColumn("effective_end_date", ts(far))
      .filter(lit(false))
    (1 to 4).foreach { day =>
      // ~12 of 8 possible keys per batch, attr drawn from 3 values so
      // unchanged/changed/new/absent all occur repeatedly across batches
      val batch = rnd.shuffle((0L until 8L).toList).take(5)
        .map(k => k -> s"a${rnd.nextInt(3)}")
      applyRef(batch, day)
      dim = Scd2.merge(dim,
        batch.toDF("id", "attr").withColumn("row_hash", col("attr")),
        "id", ts(f"2024-01-0$day%d 00:00:00"),
        farFuture = ts(far)).localCheckpoint(true)
    }
    val got = dim
      .select(col("id"), col("attr"), col("version"), col("is_current"),
        dayofmonth(col("effective_start_date")).as("sd"),
        when(year(col("effective_end_date")) === 9999, 99)
          .otherwise(dayofmonth(col("effective_end_date"))).as("ed"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3),
        r.getInt(4), r.getInt(5))).toSet
    val expect = state.values.flatten
      .map(v => (v.k, v.a, v.version, v.current, v.startDay, v.endDay)).toSet
    assert(got == expect)
  }
}
