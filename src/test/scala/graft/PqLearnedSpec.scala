package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Learned OPQ rotation (PCA + eigenvalue allocation): the
  * data-dependent tier behind the signedPermOf seam. The corpus here
  * is built to defeat any permutation: the two dominant variance
  * directions are DENSE (off-axis) — u = ones/4, w = (+1/4 ×8, −1/4
  * ×8) — so no reordering of coordinates concentrates them, while PCA
  * rotates them onto two coordinates and the eigenvalue allocation
  * sends each to a different subspace.
  */
class PqLearnedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dim = 16

  // r = z1·u + z2·w + tiny noise, all md5-free deterministic hashes
  private def corpus = {
    val z1 = (pmod(col("vec_id") * 2654435761L, lit(1000L)).cast("double") / 500.0) - 1.0
    val z2 = ((pmod(col("vec_id") * 104729L + 17L, lit(1000L)).cast("double") / 500.0) - 1.0) * 0.7
    spark.range(0L, 2000L).toDF("vec_id")
      .withColumn("r", transform(sequence(lit(0), lit(dim - 1)), p =>
        z1 * lit(0.25) +
          z2 * when(p < 8, lit(0.25)).otherwise(lit(-0.25)) +
          ((pmod(col("vec_id") * 31L + p.cast("long") * 7919L, lit(1000L))
            .cast("double") / 500.0) - 1.0) / 1000.0))
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

  test("learned rotation is orthonormal, deterministic, and beats both fixed tiers") {
    val full = corpus.persist()
    try {
      val rot = Similarity.opqRotationOf(
        full.select(col("vec_id"), col("r")), dim)
      // deterministic: a second derivation is bit-identical
      val rot2 = Similarity.opqRotationOf(
        full.select(col("vec_id"), col("r")), dim)
      assert(rot.size == dim &&
        rot.zip(rot2).forall { case (a, b) => a.sameElements(b) })
      // orthonormal rows: R·Rᵀ == I within 1e-9
      for (i <- 0 until dim; j <- i until dim) {
        val d = rot(i).zip(rot(j)).map { case (a, b) => a * b }.sum
        val want = if (i == j) 1.0 else 0.0
        assert(math.abs(d - want) < 1e-9, s"R·Rᵀ($i,$j) = $d")
      }
      // norm preservation on the actual data
      val normDiff = full
        .select(abs(
          aggregate(col("r"), lit(0.0), (a, x) => a + x * x) -
            aggregate(Similarity.rotateByMatrix(col("r"), rot),
              lit(0.0), (a, x) => a + x * x)).as("d"))
        .agg(max(col("d"))).head().getDouble(0)
      assert(normDiff < 1e-9, s"learned rotation changed norms by $normDiff")

      // three tiers through the production residual seam (zero codebook
      // ⇒ residual == vector), 16 codes each
      val e = full.select(col("vec_id"), col("r").as("emb"))
      val assign = full.select(col("vec_id"), lit(0L).as("centroid_id"))
      val cb = spark.range(1).select(lit(0L).as("centroid_id"),
        transform(sequence(lit(0), lit(dim - 1)), _ => lit(0.0)).as("c_emb"))
      val plain = Similarity.pqResidualSubs(e, assign, cb, rotateDim = None).persist()
      val perm = Similarity.pqResidualSubs(e, assign, cb, rotateDim = Some(dim)).persist()
      val learned = Similarity.pqResidualSubsLearned(e, assign, cb, rot).persist()
      try {
        val (bp, cp) = Similarity.pqTrain(plain, 16)
        val (bs, cs) = Similarity.pqTrain(perm, 16)
        val (bl, cl) = Similarity.pqTrain(learned, 16)
        val (ep, es, el) =
          (meanErr(plain, bp, cp), meanErr(perm, bs, cs), meanErr(learned, bl, cl))
        // dense off-axis variance: permutations can't concentrate it,
        // PCA + allocation gives each subspace a 1-D dominant signal
        assert(el < ep, s"learned $el not under plain $ep")
        assert(el < es, s"learned $el not under signed-perm $es")
      } finally {
        plain.unpersist(false); perm.unpersist(false); learned.unpersist(false)
      }
    } finally { full.unpersist(false); spark.catalog.clearCache() }
  }
}
