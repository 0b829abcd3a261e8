package org.apache.spark.sql

/** Test-only package-escape: CacheManager is private[sql], and the
  * releaseQueryCaches spec needs to assert it is EMPTY (not just that
  * the persistent-RDD map is — the two are tracked separately, which
  * is the whole reason the helper sweeps both layers).
  */
object GraftCacheProbe {
  def cacheManagerIsEmpty(spark: SparkSession): Boolean =
    spark.sharedState.cacheManager.isEmpty
}
