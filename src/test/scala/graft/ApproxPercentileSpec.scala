package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Analytics2, TextAnalysis}

/** The runnable 100×-scale path for the exact-percentile sites flagged
  * in round 4 (q26/q44/q33/t07): same functions, `approx = true`.
  * These tests pin that the approx variants (a) keep the exact schema,
  * (b) land within honest bounds of the exact answers at test scale,
  * and (c) — in PlanHygieneSpec — partial-aggregate a bounded sketch
  * instead of buffering whole groups in one task.
  */
class ApproxPercentileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("q26 approx: same segments/schema; quantiles ordered and inside [min, max]") {
    val exact = Analytics2.segmentPercentiles(spark, TestSpark.sf)
    val approx = Analytics2.segmentPercentiles(spark, TestSpark.sf, approx = true)
    assert(approx.schema.map(f => (f.name, f.dataType)).toSeq ==
      exact.schema.map(f => (f.name, f.dataType)).toSeq,
      "approx path must keep the exact path's schema, types included")
    val rows = approx.collect()
    assert(rows.length == exact.count())
    rows.foreach { r =>
      val Seq(p25, med, p75, p90) = Seq("p25", "median", "p75", "p90")
        .map(c => r.getAs[Double](c))
      val (lo, hi) = (r.getAs[Double]("min_total"), r.getAs[Double]("max_total"))
      assert(lo <= p25 && p25 <= med && med <= p75 && p75 <= p90 && p90 <= hi,
        s"quantiles out of order for ${r.getAs[String]("segment")}")
    }
    // approx_percentile returns a dataset element near each quantile —
    // at sf0.001 densities that is within a few percent of the exact
    // interpolated value
    val pairs = exact.select(col("segment"), col("median").as("ex"))
      .join(approx.select(col("segment"), col("median").as("ap")), "segment")
      .collect()
    pairs.foreach { r =>
      val (ex, ap) = (r.getAs[Double]("ex"), r.getAs[Double]("ap"))
      assert(math.abs(ap - ex) / ex < 0.10, s"median drifted: exact=$ex approx=$ap")
    }
  }

  test("q44 approx: all customers classified; per-decile counts near-even") {
    val approx = Analytics2.revenueDeciles(spark, TestSpark.sf, approx = true)
    val exact = Analytics2.revenueDeciles(spark, TestSpark.sf)
    assert(approx.schema.map(f => (f.name, f.dataType)).toSeq ==
      exact.schema.map(f => (f.name, f.dataType)).toSeq,
      "approx path must keep the exact path's schema, types included")
    val n = approx.agg(sum("n_customers")).collect().head.getLong(0)
    assert(n == exact.agg(sum("n_customers")).collect().head.getLong(0),
      "approx boundaries must still classify every customer exactly once")
    // boundaries from the sketch are near the exact ones, so no decile
    // collapses or balloons (exact deciles are ~10% each)
    approx.collect().foreach { r =>
      val share = r.getAs[Long]("n_customers").toDouble / n
      assert(share > 0.05 && share < 0.20,
        s"decile ${r.getAs[Long]("decile")} share $share implausible for approx bounds")
    }
  }

  test("q52 approx: same schema, every customer scored, m-score spread held") {
    val approx = Analytics2.rfmSegmentation(spark, TestSpark.sf, approx = true)
    val exact = Analytics2.rfmSegmentation(spark, TestSpark.sf)
    assert(approx.schema.map(f => (f.name, f.dataType)).toSeq ==
      exact.schema.map(f => (f.name, f.dataType)).toSeq)
    assert(approx.count() == exact.count())
    val rows = approx.collect()
    rows.foreach { r =>
      Seq("r_score", "f_score", "m_score").foreach { c =>
        val s = r.getAs[Long](c); assert(s >= 1 && s <= 5)
      }
    }
    // sketch boundaries stay near the exact quintiles on the
    // near-continuous monetary axis — no score bucket swallows the base
    val mCounts = rows.groupBy(_.getAs[Long]("m_score")).view.mapValues(_.size)
    assert(mCounts.size == 5 && mCounts.values.max <= rows.length * 0.3)
  }

  test("t07 approx: same keep semantics, per-language keep rate near 75%") {
    val approx = TextAnalysis.qualityPrune(spark, TestSpark.sf, approx = true)
    val exact = TextAnalysis.qualityPrune(spark, TestSpark.sf)
    assert(approx.schema.map(f => (f.name, f.dataType)).toSeq ==
      exact.schema.map(f => (f.name, f.dataType)).toSeq,
      "approx path must keep the exact path's schema, types included")
    assert(approx.count() == exact.count(), "audit trail must keep one row per doc")
    val rates = approx.groupBy("lang")
      .agg(avg(col("is_kept").cast("double")).as("rate")).collect()
    rates.foreach { r =>
      val rate = r.getAs[Double]("rate")
      assert(rate >= 0.60 && rate <= 0.95,
        s"${r.getAs[String]("lang")} keep rate $rate far from the 75% target")
    }
  }

  test("q33 approx: per-language token quantiles ordered and within corpus range") {
    val approx = TextAnalysis.corpusStats(spark, TestSpark.sf, approx = true)
    val exact = TextAnalysis.corpusStats(spark, TestSpark.sf)
    assert(approx.schema.map(f => (f.name, f.dataType)).toSeq ==
      exact.schema.map(f => (f.name, f.dataType)).toSeq,
      "approx path must keep the exact path's schema, types included")
    assert(approx.count() == exact.count())
    approx.collect().foreach { r =>
      val Seq(p25, p50, p90) = Seq("p25_tokens", "p50_tokens", "p90_tokens")
        .map(c => r.getAs[Number](c).doubleValue())
      assert(p25 <= p50 && p50 <= p90,
        s"token quantiles out of order for ${r.getAs[String]("lang")}")
      assert(p90 <= r.getAs[Long]("total_tokens"))
    }
  }
}
