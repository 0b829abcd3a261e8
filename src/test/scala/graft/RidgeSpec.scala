package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

class RidgeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("t28: coefficients solve the ridge normal equations exactly (driver replay) " +
      "and are deterministic across runs") {
    val K = TextAnalysis.RidgeDims
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
    val feats = TextAnalysis.ridgeFeatures(docs).collect()
    assert(feats.nonEmpty)
    // independent driver-side rebuild of X'X and X'y from the feature rows
    val a = Array.ofDim[Double](K, K)
    val c = new Array[Double](K)
    feats.foreach { r =>
      val x = (0 until K).map(j => r.getAs[Long](s"f$j").toDouble).toArray
      val y = r.getAs[Long]("y").toDouble
      for (i <- 0 until K; j <- 0 until K) a(i)(j) += x(i) * x(j)
      for (i <- 0 until K) c(i) += x(i) * y
    }
    val out = TextAnalysis.qualityRidge(spark, TestSpark.sf).collect()
    assert(out.length == K)
    val b = out.map(r => r.getAs[Long]("feature_idx") -> r.getAs[Double]("coef")).toMap
    assert((0 until K).forall(i => !b(i.toLong).isNaN && !b(i.toLong).isInfinite))
    // residual of (X'X + λI)b − X'y, relative to the RHS scale — the
    // Cholesky is exact to rounding, so this pins both the solve and
    // the feature/sum plumbing end to end
    val scale = math.max(c.map(math.abs).max, 1.0)
    for (i <- 0 until K) {
      var lhs = TextAnalysis.RidgeLambda * b(i.toLong)
      for (j <- 0 until K) lhs += a(i)(j) * b(j.toLong)
      assert(math.abs(lhs - c(i)) / scale < 1e-9,
        s"normal-equation residual at dim $i: lhs=$lhs rhs=${c(i)}")
    }
    // named dims are stable
    assert(out.find(_.getAs[Long]("feature_idx") == 0L)
      .get.getAs[String]("feature") == "intercept")
    // deterministic across a second run (exact integer sums + fixed
    // IEEE solve order)
    val again = TextAnalysis.qualityRidge(spark, TestSpark.sf).collect()
      .map(r => r.getAs[Long]("feature_idx") -> r.getAs[Double]("coef")).toMap
    assert(again == b)
  }

  test("t29: confusion cells cover every doc and the 32-feature ridge beats the " +
      "2-feature probe's overall accuracy on the weak label") {
    val rows = TextAnalysis.ridgeApply(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, tp, fp, fn, tn) = (r.getAs[Long]("n_docs"), r.getAs[Long]("tp"),
        r.getAs[Long]("fp"), r.getAs[Long]("fn"), r.getAs[Long]("tn"))
      assert(tp + fp + fn + tn == n, s"cells must cover n_docs in ${r}")
      val acc = r.getAs[Double]("accuracy")
      assert(acc >= 0.0 && acc <= 1.0)
    }
    val n = rows.map(_.getAs[Long]("n_docs")).sum
    val ridgeCorrect = rows.map(r => r.getAs[Long]("tp") + r.getAs[Long]("tn")).sum
    // probe_accuracy is per-source; weight back to a corpus accuracy
    val probeCorrect = rows.map(r =>
      r.getAs[Double]("probe_accuracy") * r.getAs[Long]("n_docs")).sum
    assert(ridgeCorrect.toDouble / n > probeCorrect / n,
      s"ridge ${ridgeCorrect.toDouble / n} must beat probe ${probeCorrect / n}")
  }
}
