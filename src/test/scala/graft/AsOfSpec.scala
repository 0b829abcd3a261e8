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

  test("asOfJoin matches a brute-force reference on randomized tie-heavy data") {
    import spark.implicits._
    // tiny key/timestamp domains force the hard cases: same-instant
    // left/right rows, multiple right rows tied at the winning
    // timestamp, keys with no prior row at all
    val rnd = new scala.util.Random(42)
    val lefts = (1 to 150).map(i =>
      (i.toLong, rnd.nextInt(5).toLong, new Timestamp(rnd.nextInt(20) * 1000L)))
    val rights = (1 to 200).map(i =>
      (rnd.nextInt(5).toLong, new Timestamp(rnd.nextInt(20) * 1000L), i.toLong * 10))
    val got = AsOf.asOfJoin(
        lefts.toDF("lid", "k", "t"), rights.toDF("k", "t", "rid"),
        key = "k", ts = "t", payload = Seq("rid"))
      .select(col("lid"), col("prior.rid").as("rid")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // reference: among right rows at-or-before, the max by (ts, payload)
    // — the operator's documented tie-break
    val expect = lefts.map { case (lid, k, t) =>
      val cands = rights.filter(r => r._1 == k && !r._2.after(t))
      lid -> (if (cands.isEmpty) -1L else cands.maxBy(r => (r._2.getTime, r._3))._3)
    }.toMap
    assert(got == expect)
  }
}
