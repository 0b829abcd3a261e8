package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every operator module's (query, oracle) surface.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.monthlySalesTrend(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Analytics.queries ++ Dimensions.queries ++ Facts.queries ++
      Marts.queries ++ Cleaning.queries ++ TextAnalysis.queries ++
      Events.queries ++ Dedup.queries ++ Similarity.queries ++ AsOf.queries ++
      Analytics2.queries ++ Graph.queries ++ Sketches.queries ++
      Multimodal.queries ++ ReferenceQueries.queries ++
      graft.streaming.StreamQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Analytics.oracle ++ Dimensions.oracle ++ Facts.oracle ++
      Marts.oracle ++ Cleaning.oracle ++ TextAnalysis.oracle ++
      Events.oracle ++ Dedup.oracle ++ Similarity.oracle ++ AsOf.oracle ++
      Analytics2.oracle ++ Graph.oracle ++ Sketches.oracle ++
      Multimodal.oracle ++ ReferenceQueries.oracle ++
      graft.streaming.StreamQueries.oracle
}
