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

  test("every bench entry has a calibration probe class") {
    // the class-aware gate only works if no query silently falls back
    // to the scalar median — a new queries() entry must be classified
    val benchNames = SparkEntry.queries.keySet ++
      Seq("x01_skew_plain_join", "x02_skew_salted_join",
        "x03_shuffle_smj", "x04_bucketed_smj", "x05_ivf_compute")
    val unclassified = benchNames -- Bench.queryClass.keySet
    assert(unclassified.isEmpty, s"unclassified bench entries: $unclassified")
    val stale = Bench.queryClass.keySet -- benchNames
    assert(stale.isEmpty, s"stale queryClass entries: $stale")
    val probes = Bench.probeRefs.map(_._1).toSet
    assert(Bench.queryClass.values.toSet.subsetOf(probes))
  }
}
