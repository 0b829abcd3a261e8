package graft

import java.security.MessageDigest

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

/** Exact driver-side replays of the sketch family (the GraphSpec
  * discipline): every register, cell, and estimate is recomputed in
  * plain Scala from the same md5-derived integers, and the distributed
  * result must match BIT-FOR-BIT — a single ulp of divergence in the
  * estimate chain or one misrouted register fails loudly. Random
  * corpora, multiple trials.
  */
class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  private def h60(s: String): Long = java.lang.Long.parseLong(md5hex(s).substring(0, 15), 16)
  private def h2of(s: String): Long = java.lang.Long.parseLong(md5hex(s).substring(16, 30), 16)

  /** Random (source, text) corpus: `nDocs` docs over a `vocab`-word
    * universe, sources s0..s{nSrc-1}; word w### so tokens are unique.
    */
  private def corpus(rnd: Random, nSrc: Int, nDocs: Int, vocab: Int): Seq[(String, String)] =
    (1 to nDocs).map { _ =>
      val src = s"s${rnd.nextInt(nSrc)}"
      val words = Seq.fill(3 + rnd.nextInt(40))(s"w${rnd.nextInt(vocab)}")
      (src, words.mkString(" "))
    }

  test("s01 HLL registers and estimate match an exact driver-side replay") {
    import spark.implicits._
    val rnd = new Random(11)
    for (_ <- 1 to 3) {
      val docs = corpus(rnd, 3, 60, 400)
      val got = Sketches.hllDistinctOf(docs.toDF("source", "text")).collect()
        .map(r => r.getString(0) -> r).toMap

      val alpha = 0.7213 / (1.0 + 1.079 / 256)
      val m2p53 = 256.0 * 256 * (1L << 53).toDouble
      val bySrc = docs.groupBy(_._1).view.mapValues(_.flatMap(_._2.split(" "))).toMap
      for ((src, toks) <- bySrc) {
        val hs = toks.map(h60)
        val regs = hs.groupBy(_ % 256).view.mapValues { g =>
          g.map { h =>
            val w = h / 256
            if (w == 0) 53 else 53 - (64 - java.lang.Long.numberOfLeadingZeros(w))
          }.max
        }.toMap
        val nz = regs.size.toLong
        val sFp = regs.values.map(r => 1L << (53 - r)).sum + (256L - nz) * (1L << 53)
        val raw = alpha * m2p53 / sFp.toDouble
        val v = 256L - nz
        // the literal-table linear-counting branch, replayed
        val est = if (v > 0 && raw <= 2.5 * 256) 256.0 * math.log(256.0 / v) else raw
        val exact = hs.toSet.size.toLong
        val err = math.floor(math.abs(est - exact.toDouble) * 1000.0 / exact.toDouble).toLong
        val row = got(src)
        assert(row.getLong(1) == exact, s"$src exact")
        assert(row.getLong(2) == nz, s"$src filled")
        assert(row.getLong(3) == v, s"$src zero")
        assert(row.getLong(4) == sFp, s"$src harmonic sum")
        assert(row.getDouble(5) == raw, s"$src raw estimate (must be bit-identical)")
        assert(row.getDouble(6) == est, s"$src corrected estimate (must be bit-identical)")
        assert(row.getLong(7) == err, s"$src err_permille")
        // the corrected estimator is ACCURATE in the small-range regime
        assert(est > exact * 0.75 && est < exact * 1.25, s"$src estimate accurate")
      }
    }
  }

  test("s02 count-min cells and estimates match an exact driver-side replay") {
    import spark.implicits._
    val rnd = new Random(23)
    for (_ <- 1 to 3) {
      val docs = corpus(rnd, 2, 50, 120)
      val got = Sketches.cmsHeavyHittersOf(docs.toDF("source", "text")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2))

      val toks = docs.flatMap(_._2.split(" "))
      val cells = toks.flatMap { t =>
        val (a, b) = (h60(t), h2of(t))
        (0 until 4).map(i => (i, (a + i * b) % 1024))
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val counts = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val top = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(20)
      val want = top.map { case (t, c) =>
        val (a, b) = (h60(t), h2of(t))
        val est = (0 until 4).map(i => cells((i, (a + i * b) % 1024))).min
        (t, c, est, est - c)
      }.sortBy(t => (t._1, t._2))
      assert(got.toSeq == want)
      // the CMS one-sided guarantee: never an underestimate
      got.foreach { case (t, c, est, _) => assert(est >= c, s"$t underestimated") }
    }
  }

  test("s05 HLL union: merged registers equal the direct build and the driver replay") {
    import spark.implicits._
    val rnd = new Random(61)
    for (_ <- 1 to 3) {
      val docs = corpus(rnd, 4, 60, 500)
      val row = Sketches.hllUnionOf(docs.toDF("source", "text")).collect()(0)

      val hs = docs.flatMap(_._2.split(" ")).map(h60)
      val regs = hs.groupBy(_ % 256).view.mapValues { g =>
        g.map { h =>
          val w = h / 256
          if (w == 0) 53 else 53 - (64 - java.lang.Long.numberOfLeadingZeros(w))
        }.max
      }.toMap
      val sFp = regs.values.map(r => 1L << (53 - r)).sum +
        (256L - regs.size) * (1L << 53)
      assert(row.getAs[Boolean]("merged_equals_direct"),
        "bucket-wise max of per-source registers == one global build")
      assert(row.getAs[Long]("merged_s_fp") == sFp, "merged harmonic sum (driver replay)")
      assert(row.getAs[Long]("direct_s_fp") == sFp)
      assert(row.getAs[Long]("exact_distinct") == hs.toSet.size.toLong)
      val alpha = 0.7213 / (1.0 + 1.079 / 256)
      val m2p53 = 256.0 * 256 * (1L << 53).toDouble
      val raw = alpha * m2p53 / sFp.toDouble
      val v = 256L - regs.size
      val est = if (v > 0 && raw <= 2.5 * 256) 256.0 * math.log(256.0 / v) else raw
      assert(row.getAs[Double]("raw_estimate") == raw)
      assert(row.getAs[Double]("hll_estimate") == est)
    }
  }

  test("s04 sampled quantiles: gate replay, bracketing, and determinism") {
    import spark.implicits._
    val rnd = new Random(41)
    val orders = (1L to 3000L).map { k =>
      (k, s"P${rnd.nextInt(3)}", BigDecimal(1000 + rnd.nextInt(900000)) / 100)
    }
    val df = orders.toDF("o_orderkey", "o_orderpriority", "o_totalprice")
    val got = Sketches.sampledQuantilesOf(df).collect()
      .map(r => r.getString(0) -> r).toMap

    // driver-side gate replay: the sample is exactly the md5-gated subset
    val inSample = orders.filter { case (k, _, _) =>
      java.lang.Long.parseLong(md5hex(s"${k}_q").substring(0, 4), 16) % 64 == 0
    }
    val bySrc = orders.groupBy(_._2)
    for ((p, rows) <- bySrc) {
      val row = got(p)
      assert(row.getLong(1) == rows.size.toLong, s"$p n")
      assert(row.getLong(5) == inSample.count(_._2 == p).toLong, s"$p n_samp (gate replay)")
      // exact percentiles bracket within the group's value range and are ordered
      val vals = rows.map(_._3.toDouble)
      val (p50, p90, p99) = (row.getDouble(2), row.getDouble(3), row.getDouble(4))
      assert(p50 >= vals.min && p99 <= vals.max && p50 <= p90 && p90 <= p99, s"$p ordering")
    }
    // bit-determinism across independent plans
    val again = Sketches.sampledQuantilesOf(df).collect()
      .map(r => r.getString(0) -> r.toSeq).toMap
    assert(got.view.mapValues(_.toSeq).toMap == again)
  }

  test("s03 theta overlap matches an exact driver-side replay; empty samples keep their pairs") {
    import spark.implicits._
    val rnd = new Random(37)
    val thetaT = 1L << 54
    for (trial <- 1 to 3) {
      // trial 3 adds a one-token source whose theta sample is likely
      // empty — its pairs must still appear with inter/theta = 0
      val base = corpus(rnd, 3, 50, 300)
      val docs = if (trial == 3) base :+ (("tiny", "lonetokenxyz")) else base
      val got = Sketches.thetaOverlapOf(docs.toDF("source", "text")).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
            r.getLong(7), r.getLong(8), r.getLong(9), r.getLong(10))).toMap

      val bySrc = docs.groupBy(_._1).view
        .mapValues(_.flatMap(_._2.split(" ")).map(h60).toSet).toMap
      val srcs = bySrc.keys.toSeq.sorted
      val pairs = for (a <- srcs; b <- srcs if a < b) yield (a, b)
      assert(got.keySet == pairs.toSet, "every source pair appears exactly once")
      for ((a, b) <- pairs) {
        val (ea, eb) = (bySrc(a), bySrc(b))
        val (sa, sb) = (ea.filter(_ < thetaT), eb.filter(_ < thetaT))
        val ie = (ea & eb).size.toLong
        val is = (sa & sb).size.toLong
        val exJ = 1000 * ie / (ea.size + eb.size - ie)
        val thJ = if (sa.size + sb.size - is == 0) 0L
                  else 1000 * is / (sa.size + sb.size - is)
        val want = (ea.size.toLong, eb.size.toLong, ie, sa.size.toLong, sb.size.toLong,
          is, exJ, thJ, math.abs(thJ - exJ))
        assert(got((a, b)) == want, s"pair ($a,$b)")
      }
    }
  }
}
