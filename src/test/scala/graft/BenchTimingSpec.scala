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

  test("min-of-reps is the gate statistic: contention can only inflate it") {
    // one calm rep among contended ones is enough — the property the
    // median lacks (round 6: all three of frozen x03's reps landed in
    // a contended window and the median read 38x baseline)
    assert(Bench.Timing(Seq(21.2, 0.58, 19.9), Nil).min == 0.58)
    assert(Bench.Timing(Nil, Seq("boom")).min == -1.0)
  }

  test("every bench entry has a calibration probe class") {
    // the class-aware gate only works if no query silently falls back
    // to the scalar median — a new queries() entry must be classified.
    // The bench surface derives from Bench.extraNames (not a literal
    // copy) so a Bench-only entry added there cannot escape this pin.
    val benchNames = SparkEntry.queries.keySet ++ Bench.extraNames
    val unclassified = benchNames -- Bench.queryClass.keySet
    assert(unclassified.isEmpty, s"unclassified bench entries: $unclassified")
    val stale = Bench.queryClass.keySet -- benchNames
    assert(stale.isEmpty, s"stale queryClass entries: $stale")
    val probes = Bench.probeRefs.map(_._1).toSet
    assert(Bench.queryClass.values.toSet.subsetOf(probes))
  }

  test("compact-line id prefixes are unique across the bench surface") {
    // the stdout line keys queries by the prefix before the first '_'
    // ("q01", "d03", "stream_qu") to fit the harness's ~2 KB tail
    // capture; the mapping must stay injective (no two queries merge)
    // and short (a family falling back to many full names could push
    // the line back over the window)
    val benchNames = (SparkEntry.queries.keySet ++ Bench.extraNames).toSeq
    val short = Bench.shortKeys(benchNames)
    assert(short.values.toSet.size == benchNames.size,
      s"shortKeys not injective: ${short.groupBy(_._2).filter(_._2.size > 1)}")
    // 13 admits "multimodal_ne" (the bare "multimodal" row forced the
    // family to the second-token tier); anything longer means a new
    // colliding family fell back to full names
    val long = short.values.filter(_.length > 13)
    assert(long.isEmpty, s"short keys over 13 chars: $long")
  }
}
