package graft

import org.apache.spark.sql.GraftCacheProbe
import org.scalatest.funsuite.AnyFunSuite

/** Session-scoped cache hygiene ([[GraftSession.releaseQueryCaches]]):
  * the operators' persist/localCheckpoint contracts all lean on the
  * Bench/Verify harness's per-query `clearCache()`; this spec pins the
  * packaged equivalent a long-lived user session calls — after
  * release, the CacheManager holds zero cached plans AND the
  * SparkContext tracks zero persisted RDDs (localCheckpoint leaves
  * included, which `clearCache()` alone never frees).
  */
class CacheReleaseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("releaseQueryCaches empties both cache layers after cache-heavy queries") {
    // d16 persists query-scoped candidate frames (CacheManager layer);
    // q61's HITS iterations leave localCheckpoint RDD blocks (the
    // layer clearCache can't see)
    SparkEntry.queries("d16_containment_dedup")(spark, TestSpark.sf).count()
    SparkEntry.queries("q61_purchase_hits")(spark, TestSpark.sf).count()
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "precondition: the queries should have left persisted RDDs behind")

    GraftSession.releaseQueryCaches(spark)

    assert(GraftCacheProbe.cacheManagerIsEmpty(spark),
      "CacheManager still holds cached plans after release")
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "persisted/localCheckpoint RDDs survive release: " +
        spark.sparkContext.getPersistentRDDs.values.map(_.name).mkString(", "))
  }

  test("released queries recompute correctly (release is never corrupting)") {
    val before = SparkEntry.queries("d16_containment_dedup")(spark, TestSpark.sf)
      .collect().map(_.toSeq.map(String.valueOf)).map(_.mkString("|")).sorted.toSeq
    GraftSession.releaseQueryCaches(spark)
    val after = SparkEntry.queries("d16_containment_dedup")(spark, TestSpark.sf)
      .collect().map(_.toSeq.map(String.valueOf)).map(_.mkString("|")).sorted.toSeq
    assert(after == before)
    GraftSession.releaseQueryCaches(spark)
  }
}
