package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions
import graft.plans.CosineSimilarity

class CosineSimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("custom expression matches the higher-order-function composition bit-for-bit") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(3.0, 2.0, 1.0)),
      (Array(0.5, -0.25, 0.125), Array(-0.5, 0.25, 0.125)),
      (Array(1.0, 0.0), Array(0.0, 1.0)))
      .toDF("a", "b")
    val got = df.select(
      CosineSimilarity.cosineSim(col("a"), col("b")).as("fast"),
      VectorFunctions.cosine(col("a"), col("b")).as("ref")).collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("length mismatch and null elements yield null, not a truncated score") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(1.0, 2.0)),          // length mismatch
      (Array(1.0, 2.0), Array(1.0, 2.0)))                // clean
      .toDF("a", "b")
    val got = df.select(CosineSimilarity.cosineSim(col("a"), col("b")).as("c")).collect()
    assert(got(0).isNullAt(0))
    assert(math.abs(got(1).getDouble(0) - 1.0) < 1e-12)
    // null element inside an array — interpreted and codegen paths agree
    val withNullElem = Seq(
      (Array[java.lang.Double](1.0, null, 3.0), Array[java.lang.Double](1.0, 2.0, 3.0)))
      .toDF("a", "b")
    assert(withNullElem.select(CosineSimilarity.cosineSim(col("a"), col("b")))
      .collect().head.isNullAt(0))
  }

  test("null inputs yield null; SQL registration works") {
    import spark.implicits._
    CosineSimilarity.register(spark)
    val df = Seq((Some(Array(1.0, 2.0)), Option.empty[Array[Double]]))
      .toDF("a", "b")
    assert(df.select(CosineSimilarity.cosineSim(col("a"), col("b"))).collect().head.isNullAt(0))
    df.createOrReplaceTempView("vecs")
    val viaSql = spark.sql("SELECT cosine_similarity(a, a) AS c FROM vecs").collect().head
    assert(math.abs(viaSql.getDouble(0) - 1.0) < 1e-12)
  }
}
