package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's aggregation rules are the round's trust mechanism —
  * pin them: medians ignore a single contended rep, failures never
  * masquerade as times, and partial failures stay visible.
  */
class BenchTimingSpec extends AnyFunSuite {

  test("median of three reps discards one contended outlier") {
    assert(Bench.Timing(Seq(0.5, 9.9, 0.6), Nil).median == 0.6)
    assert(Bench.Timing(Seq(9.9, 0.5, 0.6), Nil).max == 9.9)
  }

  test("lower median for even rep counts; single rep is itself") {
    assert(Bench.Timing(Seq(2.0, 1.0), Nil).median == 1.0)
    assert(Bench.Timing(Seq(3.0), Nil).median == 3.0)
  }

  test("all-failed reps yield the -1 marker, never a fake time") {
    val t = Bench.Timing(Nil, Seq("SparkException: boom"))
    assert(t.median == -1.0 && t.max == -1.0 && t.errors.nonEmpty)
  }

  test("a partially-failed query keeps both its median and its error") {
    val t = Bench.Timing(Seq(0.4, 0.5), Seq("SparkException: flaky"))
    assert(t.median == 0.4)
    assert(t.errors == Seq("SparkException: flaky"))
  }
}
