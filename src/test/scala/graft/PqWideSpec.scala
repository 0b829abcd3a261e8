package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** The 8-bit PQ path (the production code width): the shipped q49/q50
  * tier is gated at 16 codes because the sf0.1 holdout cells are too
  * small to populate 256 codewords, so this spec GENERATES a residual
  * corpus big enough (4k vectors × 4 subspaces of deterministic
  * hash-derived subvectors) and drives the width-parameterized trainer
  * at ks=256, pinning exactly what the gate comment promises:
  * codebooks populate, codes stay in range, and the wider codebook
  * strictly tightens quantization error vs the 16-code tier on the
  * SAME corpus.
  */
class PqWideSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // deterministic pseudo-random subvectors: value = fractional part of
  // a md5-free integer hash — reproducible on any partitioning
  private def subs = {
    import spark.implicits._
    spark.range(0L, 4000L).toDF("vec_id")
      .withColumn("m", explode(sequence(lit(0L), lit(3L))))
      .withColumn("rm", transform(sequence(lit(0), lit(3)),
        p => (pmod(col("vec_id") * 2654435761L + col("m") * 7919L
          + p.cast("long") * 104729L, lit(1000L)).cast("double") / 500.0) - 1.0))
  }

  private def meanErr(s: org.apache.spark.sql.DataFrame,
                      book: org.apache.spark.sql.DataFrame,
                      codes: org.apache.spark.sql.DataFrame): Double =
    s.join(codes, Seq("vec_id", "m"))
      .join(book, Seq("m", "code"))
      .select(aggregate(
        zip_with(col("rm"), col("code_emb"), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x).as("d2"))
      .agg(avg(col("d2"))).head().getDouble(0)

  test("signed-perm rotation preserves norms and re-balances a variance-skewed corpus") {
    import spark.implicits._
    // dims 0-3 carry almost all the variance; 4-15 are near-constant —
    // the shape plain slicing handles worst (one subspace absorbs all
    // quantization error) and OPQ-style rotation exists to fix
    val dim = 16
    val full = spark.range(0L, 2000L).toDF("vec_id")
      .withColumn("r", transform(sequence(lit(0), lit(dim - 1)), p =>
        when(p < 4,
          (pmod(col("vec_id") * 2654435761L + p.cast("long") * 7919L, lit(1000L))
            .cast("double") / 500.0) - 1.0)
          .otherwise(
            ((pmod(col("vec_id") * 104729L + p.cast("long") * 31L, lit(1000L))
              .cast("double") / 500.0) - 1.0) / 1000.0)))
    val rotated = full.withColumn("rot", Similarity.rotateResidual(col("r"), dim))
    // orthogonality: the squared norm survives the transform exactly up
    // to summation order (each term is v^2 — sign flips vanish)
    val normDiff = rotated.select(abs(
        aggregate(col("r"), lit(0.0), (a, x) => a + x * x) -
          aggregate(col("rot"), lit(0.0), (a, x) => a + x * x)).as("d"))
      .agg(max(col("d"))).head().getDouble(0)
    assert(normDiff < 1e-9, s"rotation changed norms by $normDiff")

    // drive the PRODUCTION residual seam end-to-end: a zero codebook
    // makes the residual the vector itself, so pqResidualSubs owns the
    // (rotate →) slice path for both variants
    val e = full.select(col("vec_id"), col("r").as("emb"))
    val assign = full.select(col("vec_id"), lit(0L).as("centroid_id"))
    val cb = spark.range(1).select(lit(0L).as("centroid_id"),
      transform(sequence(lit(0), lit(dim - 1)), _ => lit(0.0)).as("c_emb"))
    val plain = Similarity.pqResidualSubs(e, assign, cb, rotateDim = None).persist()
    val rot = Similarity.pqResidualSubs(e, assign, cb, rotateDim = Some(dim)).persist()
    try {
      val (bp, cp) = Similarity.pqTrain(plain, 16)
      val (br, cr) = Similarity.pqTrain(rot, 16)
      val (ep, er) = (meanErr(plain, bp, cp), meanErr(rot, br, cr))
      // the rotation spread the 4 hot dims across subspaces: every
      // subspace quantizes ~1 of them with its 16 codes instead of one
      // subspace quantizing all 4
      assert(er < ep, s"rotated error $er not under plain $ep")
      // determinism: the permutation is a pure function of dim
      assert(Similarity.signedPermOf(dim) == Similarity.signedPermOf(dim))
      assert(Similarity.signedPermOf(dim).map(_._1).sorted == (0 until dim))
    } finally {
      plain.unpersist(false); rot.unpersist(false); spark.catalog.clearCache()
    }
  }

  test("ks=256 codebooks populate on a large-enough corpus and beat ks=16 error") {
    val s = subs.persist()
    try {
      val (b16, c16) = Similarity.pqTrain(s, 16)
      val (b256, c256) = Similarity.pqTrain(s, 256)
      val (book16, codes16) = (b16.persist(), c16.persist())
      val (book256, codes256) = (b256.persist(), c256.persist())

      // every subspace's 8-bit codebook actually populates: 4000
      // vectors / 256 seeds ≈ 16 members each — no degenerate collapse
      val perSub = codes256.groupBy("m")
        .agg(countDistinct(col("code")).as("n"))
        .collect().map(r => r.getAs[Long]("m") -> r.getAs[Long]("n")).toMap
      assert(perSub.size == 4)
      perSub.foreach { case (m, n) =>
        assert(n >= 200, s"subspace $m populated only $n of 256 codes")
      }
      // codes stay in range at both widths
      assert(codes256.filter(col("code") < 0 || col("code") >= 256).count() == 0)
      assert(codes16.filter(col("code") < 0 || col("code") >= 16).count() == 0)

      // the wider codebook strictly tightens reconstruction error
      val (e16, e256) = (meanErr(s, book16, codes16), meanErr(s, book256, codes256))
      assert(e256 < e16 * 0.5,
        s"256-code error $e256 not well under 16-code error $e16")
    } finally {
      s.unpersist(false); spark.catalog.clearCache()
    }
  }
}
