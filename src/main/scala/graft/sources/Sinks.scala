package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Warehouse write surface — the reference's load layer
  * (/root/reference/etl/load.py): truncate loads, append loads, and a
  * staging-then-publish pattern, re-expressed as parquet-directory
  * semantics.
  *
  * Scale notes: `partitionedBy` drives partition pruning for downstream
  * readers (the 100 TB equivalent of BigQuery table partitioning);
  * `repartitionTo` bounds output file counts so a 1000-executor write
  * doesn't produce a million small files.
  */
object Sinks {

  /** WRITE_TRUNCATE equivalent (load.py:200: full refresh). */
  def truncateLoad(df: DataFrame, path: String,
                   partitionedBy: Seq[String] = Nil,
                   repartitionTo: Int = 0): Unit =
    write(df, path, SaveMode.Overwrite, partitionedBy, repartitionTo)

  /** WRITE_APPEND equivalent (load.py:210: incremental fact loads). */
  def appendLoad(df: DataFrame, path: String,
                 partitionedBy: Seq[String] = Nil,
                 repartitionTo: Int = 0): Unit =
    write(df, path, SaveMode.Append, partitionedBy, repartitionTo)

  /** Staging-then-publish (load.py:273-274: load batch to a `_staging`
    * suffix, then swap): write to a staging dir, read it back verified,
    * then publish with truncate semantics. Returns the published row
    * count like load.py's load_table.
    */
  def stagePublish(df: DataFrame, path: String): Long = {
    val staging = s"${path}_staging"
    df.write.mode(SaveMode.Overwrite).parquet(staging)
    val spark = df.sparkSession
    val staged = spark.read.parquet(staging)
    val n = staged.count()
    staged.write.mode(SaveMode.Overwrite).parquet(path)
    n
  }

  /** CSV export (dashboard-download analog). */
  def csvExport(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(path)

  private def write(df: DataFrame, path: String, mode: SaveMode,
                    partitionedBy: Seq[String], repartitionTo: Int): Unit = {
    val sized = if (repartitionTo > 0) df.repartition(repartitionTo) else df
    val w = sized.write.mode(mode)
    val wp = if (partitionedBy.nonEmpty) w.partitionBy(partitionedBy: _*) else w
    wp.parquet(path)
  }
}
