package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

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

  /** Build-if-missing warehouse artifact under ONE canonical keying
    * scheme: `warehouse/<family>/src<dirKey>_<sourceKey(keyFile)>` —
    * dirKey is the shell-safe dir path, sourceKey the (length, mtime)
    * fingerprint of the keying file, so a corpus change invalidates the
    * artifact and a same-corpus rebuild (all builders are deterministic)
    * is byte-identical, making staleness impossible. The single
    * definition exists so a future change to the fingerprint rule
    * touches every artifact family at once; route new families through
    * here rather than hand-rolling the exists-then-build-then-read
    * idiom (band_choice and the DSIR models already do; the older
    * families predate this helper and keep their in-place copies to
    * avoid key churn on published artifacts).
    *
    * CONCURRENCY CONTRACT: build-if-missing probes are claim-by-rename.
    * Each prober builds into its own staging dir, verifies the
    * read-back, then claims the final name with a no-overwrite rename
    * (`FileContext.rename` with `Rename.NONE` fails if the target
    * appeared) — two concurrent probes of a missing artifact both pay
    * the build, but exactly ONE wins the name and the loser deletes
    * its staging and reads the winner (builders are deterministic, so
    * the content is identical either way). Unlike [[stagePublish]]'s
    * delete-then-rename REPLACE, the final path here is never deleted
    * once published: a reader can never observe it transiently
    * missing. REPUBLISHING an artifact (changing its content in
    * place) remains single-writer by contract — for that, key the
    * content into the path (as the fingerprint already does) so a
    * "change" is a new name, not a rewrite.
    */
  def ensureArtifact(spark: SparkSession, family: String, dir: String,
                     keyFile: String = "documents.parquet")
                    (build: => DataFrame): DataFrame = {
    val path = artifactPath(spark, family, dir, keyFile)
    val p = new org.apache.hadoop.fs.Path(path)
    val conf = spark.sessionState.newHadoopConf()
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) {
      val staging = new org.apache.hadoop.fs.Path(
        s"${path}_probe_${java.util.UUID.randomUUID().toString.take(8)}")
      try {
        val df = build
        df.write.mode(SaveMode.Overwrite).parquet(staging.toString)
        // footer-metadata-only count proves every staged file is complete
        df.sparkSession.read.parquet(staging.toString).count()
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(p.toUri, conf)
        try fc.rename(staging, p) // Rename.NONE: fails if target appeared
        catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException |
                     _: java.io.IOException =>
          fs.delete(staging, true) // lost the claim — read the winner
        }
      } catch {
        case e: Throwable =>
          try fs.delete(staging, true)
          catch { case w: Throwable => e.addSuppressed(w) }
          throw e
      }
    }
    spark.read.parquet(path)
  }

  /** The canonical key alone — for always-republish builders (d03's
    * contract) that share a family with build-if-missing probes.
    * The "src" prefix matters: underscore-prefixed dirs are "hidden"
    * to Spark's file listing.
    */
  def artifactPath(spark: SparkSession, family: String, dir: String,
                   keyFile: String = "documents.parquet"): String = {
    val dirKey = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    s"${spark.conf.get("spark.sql.warehouse.dir")}/$family/" +
      s"src${dirKey}_${Tables.sourceKey(spark, s"$dir/$keyFile")}"
  }

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
    * suffix, then swap): write to a staging dir, verify it reads back
    * (a parquet count is footer-metadata-only — it proves every file is
    * complete and well-formed without rescanning the data), then SWAP
    * the staging dir into place with a filesystem rename. The data is
    * written exactly once — the earlier copy-to-publish shape paid a
    * full second read+write per artifact, which dominated the timed cost
    * of every index/pair publish. Returns the published row count like
    * load.py's load_table.
    */
  def stagePublish(df: DataFrame, path: String): Long = {
    // unique per-invocation staging dir: two concurrent builders (e.g.
    // d04 republishing the band table while d17's build-if-missing probe
    // fires in another session) can no longer write into the SAME
    // staging path. The final delete-then-rename swap is still not
    // atomic across writers — artifact families are single-writer by
    // contract (concurrent rebuilds are idempotent in content, and a
    // reader between the delete and rename of two racing publishers can
    // observe the path missing); a failed attempt cleans its own
    // staging dir instead of leaving it for the next try to overwrite.
    val staging = s"${path}_staging_${java.util.UUID.randomUUID().toString.take(8)}"
    val spark = df.sparkSession
    val stagingPath = new org.apache.hadoop.fs.Path(staging)
    val fs = stagingPath.getFileSystem(spark.sessionState.newHadoopConf())
    try {
      df.write.mode(SaveMode.Overwrite).parquet(staging)
      val n = spark.read.parquet(staging).count()
      val target = new org.apache.hadoop.fs.Path(path)
      if (fs.exists(target)) fs.delete(target, true)
      fs.rename(stagingPath, target)
      n
    } catch {
      case e: Throwable =>
        try fs.delete(stagingPath, true)
        catch { case w: Throwable => e.addSuppressed(w) }
        throw e
    }
  }

  /** JDBC staging store — the reference's optional MySQL staging layer
    * (/root/reference/etl/mysql_staging.py:28-199: create staging table,
    * bulk-load the batch, read it back for transform). Overwrite gives
    * the reference's drop-and-recreate staging semantics. Executors
    * write partitions concurrently over their own connections; cap
    * `numPartitions` so a 1000-executor write doesn't open 1000
    * connections against one RDBMS.
    */
  def jdbcStage(df: DataFrame, url: String, table: String,
                props: Properties = new Properties(),
                numPartitions: Int = 8): Unit = {
    // unconditional: coalesce to >= current partition count is a no-op,
    // and probing df.rdd.getNumPartitions would materialize the RDD
    // lineage and report the pre-AQE count anyway
    val sized = if (numPartitions > 0) df.coalesce(numPartitions) else df
    sized.write.mode(SaveMode.Overwrite).jdbc(url, table, props)
  }

  /** Read a staged table back (mysql_staging.py:150-199's
    * read_staging_table). With a `partitionColumn` + bounds the read
    * fans out across executors as range-partitioned queries — the only
    * way a JDBC scan parallelizes; without it the whole table streams
    * through one task (fine for dims, wrong for facts).
    */
  def readStaging(spark: SparkSession, url: String, table: String,
                  props: Properties = new Properties(),
                  partitionColumn: String = null,
                  lowerBound: Long = 0L, upperBound: Long = 0L,
                  numPartitions: Int = 8): DataFrame =
    if (partitionColumn == null) spark.read.jdbc(url, table, props)
    else spark.read.jdbc(url, table, partitionColumn,
      lowerBound, upperBound, numPartitions, props)

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
