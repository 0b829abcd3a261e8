package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** d26 band retune: the selection arithmetic is replayed in plain Scala
  * (same IEEE op order as the Catalyst plan) and the chosen banding is
  * checked to be consumable by the parameterized band builder.
  */
class RetuneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // the grid the operator scores: every (b, r) split of the 18-hash family
  private val grid =
    for (b <- 1 to 18; r <- 1 to 8; if b * r <= 18) yield (b.toLong, r.toLong)

  private def condPow(base: Double, n: Long, maxN: Int): Double =
    (1 to maxN).foldLeft(1.0)((acc, k) => acc * (if (k <= n) base else 1.0))

  test("grid covers every banding of the 18-hash family exactly once") {
    val rows = Dedup.bandRetune(spark, TestSpark.sf).collect()
    val got = rows.map(r => (r.getAs[Long]("n_bands"), r.getAs[Long]("n_rows"))).toSet
    assert(rows.length == grid.size && got == grid.toSet)
    rows.foreach(r => assert(r.getAs[Long]("n_hashes") <= 18L))
  }

  test("scores and selection replay exactly from the observed mixture") {
    val mix = Dedup.lshCalibration(spark, TestSpark.sf)
      .select("j_bucket", "n_true_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(mix.nonEmpty)

    // plain-Scala replay of the operator's fixed-point arithmetic,
    // design-floor gates included (theory at J=0.75 / J=0.30)
    case class Score(numT: Long, denT: Long, numL: Long, denL: Long,
                     rec75Ppb: Long, catch30Ppb: Long) {
      def passes: Boolean =
        denT > 0 && numT * 10 >= denT * 9000000000L &&
          (denL == 0 || numL * 4 <= denL * 1000000000L) &&
          rec75Ppb >= 950000000L && catch30Ppb <= 200000000L
    }
    def floorPpb(j: Double, b: Long, r: Long): Long = {
      val p = condPow(j, r, 8)
      math.floor((1.0 - condPow(1.0 - p, b, 18)) * 1000000000.0).toLong
    }
    val scores = grid.map { case (b, r) =>
      var (numT, denT, numL, denL) = (0L, 0L, 0L, 0L)
      mix.foreach { case (bucket, n) =>
        val jMid = (bucket.toDouble + 0.5) / 10.0
        val p = condPow(jMid, r, 8)
        val miss = condPow(1.0 - p, b, 18)
        val ppb = math.floor((1.0 - miss) * 1000000000.0).toLong
        if (bucket >= 5) { numT += n * ppb; denT += n }
        else { numL += n * ppb; denL += n }
      }
      (b, r) -> Score(numT, denT, numL, denL,
        floorPpb(0.75, b, r), floorPpb(0.3, b, r))
    }.toMap

    val expectChosen = grid.filter(g => scores(g).passes)
      .sortBy { case (b, r) => (b * r, b, r) }.headOption

    val rows = Dedup.bandRetune(spark, TestSpark.sf).collect()
    rows.foreach { row =>
      val key = (row.getAs[Long]("n_bands"), row.getAs[Long]("n_rows"))
      val s = scores(key)
      assert(row.getAs[Boolean]("passes") == s.passes, s"passes mismatch at $key")
      assert(row.getAs[Long]("n_target_pairs") == s.denT)
      if (s.denT > 0)
        assert(row.getAs[Double]("target_recall") ==
          s.numT.toDouble / (s.denT.toDouble * 1.0e9), s"recall mismatch at $key")
      assert(row.getAs[Boolean]("is_chosen") == expectChosen.contains(key),
        s"chosen mismatch at $key (expected $expectChosen)")
    }
    // the gates + total cost order admit at most one winner
    assert(rows.count(_.getAs[Boolean]("is_chosen")) == expectChosen.size)
  }

  test("d27 A/B reconciles with d24 on the default side; chosen==default catches agree") {
    val ab = Dedup.retunedCalibration(spark, TestSpark.sf).collect()
    assert(ab.nonEmpty)
    val (b, r) = Dedup.chosenBanding(spark, TestSpark.sf)
    ab.foreach { row =>
      assert(row.getAs[Long]("n_bands") == b.toLong &&
        row.getAs[Long]("n_rows") == r.toLong)
      val (nt, cd, cc) = (row.getAs[Long]("n_true_pairs"),
        row.getAs[Long]("caught_default"), row.getAs[Long]("caught_chosen"))
      assert(cd <= nt && cc <= nt && nt > 0)
      assert(row.getAs[Double]("recall_default") == cd.toDouble / nt)
      assert(row.getAs[Double]("recall_chosen") == cc.toDouble / nt)
    }
    // default side must reconcile with d24's report (same sampled mixture)
    val d24 = Dedup.lshCalibration(spark, TestSpark.sf).collect()
      .map(x => x.getAs[Long]("j_bucket") ->
        (x.getAs[Long]("n_true_pairs"), x.getAs[Long]("n_caught"))).toMap
    ab.foreach { row =>
      val (nt, nc) = d24(row.getAs[Long]("j_bucket"))
      assert(row.getAs[Long]("n_true_pairs") == nt)
      assert(row.getAs[Long]("caught_default") == nc)
    }
    // pairwise-signature argument: when the retune picks the shipped
    // banding, the sampled rebuild must catch EXACTLY the artifact's pairs
    if ((b, r) == (6, 3))
      ab.foreach { row =>
        assert(row.getAs[Long]("caught_chosen") ==
          row.getAs[Long]("caught_default"), s"bucket ${row.getAs[Long]("j_bucket")}")
      }
    spark.catalog.clearCache()
  }

  test("chosen banding drives the parameterized band builder") {
    val (b, r) = Dedup.chosenBanding(spark, TestSpark.sf)
    assert(b * r <= 18 && b >= 1 && r >= 1)
    import spark.implicits._
    // two identical shingle sets must collide on every band; a disjoint
    // one must collide on none (band hash = md5 over exact signatures)
    val sh = Seq(
      (1L, "a b c"), (1L, "b c d"), (2L, "a b c"), (2L, "b c d"),
      (3L, "x y z"), (3L, "y z w"))
      .toDF("doc_id", "shingle")
    val bands = Dedup.minhashBandsOf(sh, b, r).collect()
    assert(bands.count(_.getAs[Long]("doc_id") == 1L) == b)
    val byDoc = bands.groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(x =>
        (x.getAs[Long]("band_j"), x.getAs[String]("band_hash"))).toSet).toMap
    assert(byDoc(1L) == byDoc(2L))
    assert(byDoc(1L).intersect(byDoc(3L)).isEmpty)
  }

  test("a zero-pair sample degrades to the zero-weight grid, never an empty report") {
    import spark.implicits._
    // 12 docs of fully disjoint vocabularies — the observed mixture is
    // EMPTY. The report must still be the 47-row grid (the d26 left-join
    // rule; the inner crossJoin shape silently returned zero rows here)
    // with zero mixture weight, nothing passing, and the production
    // consumer falling back to the shipped 6×3.
    val dir = java.nio.file.Files.createTempDirectory("graft_nopairs").toString
    (1L to 12L).map(i =>
        (i, "en", (1 to 10).map(w => s"w${i}_$w").mkString(" "), "src0"))
      .toDF("doc_id", "lang", "text", "source")
      .write.parquet(s"$dir/documents.parquet")
    val rows = Dedup.bandRetune(spark, dir).collect()
    assert(rows.length == 47, "the full grid must survive an empty mixture")
    assert(rows.forall(_.getAs[Long]("n_target_pairs") == 0L))
    assert(rows.forall(r => !r.getAs[Boolean]("passes")
      && !r.getAs[Boolean]("is_chosen")))
    // design-floor theory columns still populate (mixture-independent)
    assert(rows.exists(_.getAs[Double]("design_recall_75") > 0.95))
    assert(Dedup.chosenBanding(spark, dir) == ((6, 3)))
  }
}
