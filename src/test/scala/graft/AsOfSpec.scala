package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOf

class AsOfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfJoin picks the latest right row at-or-before, null when none") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "L1"),
      (1L, ts("2024-01-01 12:00:00"), "L2"),
      (2L, ts("2024-01-01 09:00:00"), "L3")) // user 2 has no prior right row
      .toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 100L),
      (1L, ts("2024-01-01 11:00:00"), 200L),
      (1L, ts("2024-01-01 12:00:00"), 300L), // same instant as L2 → matches
      (2L, ts("2024-01-01 09:30:00"), 400L)) // after L3 → no match
      .toDF("k", "t", "rid")
    val out = AsOf.asOfJoin(left, right, key = "k", ts = "t", payload = Seq("rid"))
      .select(col("tag"), col("prior.rid").as("rid")).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out == Map("L1" -> 100L, "L2" -> 300L, "L3" -> -1L))
  }
}
