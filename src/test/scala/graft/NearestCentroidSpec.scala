package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.plans.CosineSimilarity

/** Pins the map-form E-step (NearestCentroid expression inside
  * Similarity.assignTo) bit-identical to the declarative plan shape it
  * replaced — crossJoin(broadcast(cents)) → groupBy(vec_id) →
  * max(struct(round(cos,4), -centroid_id)) — including the corner
  * semantics that only the old aggregate defined implicitly: rounded
  * ties keep the smallest centroid_id, NaN cosines rank GREATEST
  * (Spark double ordering), and a malformed vector (length mismatch /
  * null element / zero info) lands on (smallest id, null cos_r).
  */
class NearestCentroidSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** The retired declarative E-step, verbatim. */
  private def oldAssign(e: DataFrame, cents: DataFrame): DataFrame =
    e.crossJoin(broadcast(cents))
      .groupBy(col("vec_id"))
      .agg(
        first(col("emb")).as("emb"),
        max(struct(round(CosineSimilarity.cosineSim(col("emb"), col("c_emb")), 4).as("cos_r"),
          (-col("centroid_id")).as("neg_id"))).as("best"))
      .select(col("vec_id"), col("emb"),
        (-col("best.neg_id")).as("centroid_id"), col("best.cos_r").as("cos_r"))

  private def assertSame(e: DataFrame, cents: DataFrame): Unit = {
    val got = Similarity.assignTo(e, cents)
      .select("vec_id", "centroid_id", "cos_r").collect()
      .map(r => (r.getLong(0),
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
      .toMap
    val want = oldAssign(e, cents)
      .select("vec_id", "centroid_id", "cos_r").collect()
      .map(r => (r.getLong(0),
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
      .toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (vid, (cid, cos)) =>
      val (wcid, wcos) = want(vid)
      assert(cid == wcid, s"vec $vid: centroid $cid != $wcid")
      (cos, wcos) match {
        case (Some(a), Some(b)) =>
          assert(java.lang.Double.doubleToLongBits(a) ==
            java.lang.Double.doubleToLongBits(b), s"vec $vid: cos $a != $b")
        case (a, b) => assert(a == b, s"vec $vid: cos nullity $a != $b")
      }
    }
  }

  test("map-form E-step matches the declarative aggregate on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    for (k <- Seq(1, 7, 16, 45)) {
      val cents = e.filter(col("vec_id") < k)
        .select(col("vec_id").as("centroid_id"), col("emb").as("c_emb"))
      assertSame(e, cents)
    }
  }

  test("corner semantics: NaN cosines, exact ties, malformed vectors") {
    import spark.implicits._
    val e = Seq(
      (0L, Array(1.0, 0.0, 0.0)),   // ties centroids 0 and 1 exactly
      (1L, Array(0.0, 0.0, 0.0)),   // zero vector: NaN against everything
      (2L, Array(1.0, 2.0)),        // length mismatch: no centroid scores
      (3L, Array(0.6, 0.8, 0.0)))   // plain case
      .toDF("vec_id", "emb")
    val cents = Seq(
      (0L, Array(2.0, 0.0, 0.0)),   // same direction as centroid 1
      (1L, Array(4.0, 0.0, 0.0)),
      (2L, Array(0.0, 0.0, 0.0)),   // zero centroid: NaN against everything
      (3L, Array(0.0, 1.0, 0.0)))
      .toDF("centroid_id", "c_emb")
    assertSame(e, cents)
    // the NaN-greatest contract, asserted directly: well-formed vectors
    // land on the zero centroid (cos NaN outranks any real); the zero
    // VECTOR is NaN against every centroid — an all-NaN tie, smallest id
    val got = Similarity.assignTo(e, cents).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(0L) == 2L && got(1L) == 0L && got(3L) == 2L)
    // malformed vector: smallest id, null score
    val m = Similarity.assignTo(e.filter(col("vec_id") === 2L), cents).collect().head
    assert(m.getLong(2) == 0L && m.isNullAt(3))
  }
}
