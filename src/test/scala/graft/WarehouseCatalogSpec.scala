package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ReferenceQueries

/** The persistent-catalog deployment story
  * ([[Pipeline.registerWarehouseCatalog]]): external `USING parquet`
  * tables in a database, visible from OTHER sessions with zero
  * per-session setup — the property temp views structurally can't
  * have, and the analog of the reference's BigQuery-dataset model
  * (load.py publishes once; any authorized client queries). Pins:
  *
  *  - every published table registers; the entries are EXTERNAL;
  *  - a brand-new session (no registration call of its own, no temp
  *    views) runs all eight reference queries over the catalog and
  *    matches the temp-view path byte-for-byte (which WarehouseSqlSpec
  *    in turn pins against independent DataFrame twins — so the chain
  *    reaches the builder semantics);
  *  - re-registration after a republish with a DRIFTED schema serves
  *    the new column list (the stale-inferred-schema failure mode the
  *    drop+create contract exists to prevent);
  *  - `DROP TABLE` never deletes the parquet — the pipeline owns the
  *    files, the catalog only points at them.
  */
class WarehouseCatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val db = "graft_cat"

  // one warehouse build for the suite; registration under test happens
  // per-case so each case states its own precondition
  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft_wh_cat").toString
    Pipeline.run(spark, TestSpark.sf, dir)
    dir
  }

  private def canon(df: DataFrame): Seq[Seq[String]] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect().toSeq
      .map(_.toSeq.map(v => if (v == null) "∅" else v.toString))
      .sortBy(_.mkString("|"))
  }

  test("registerWarehouseCatalog registers every published table as EXTERNAL") {
    val names = Pipeline.registerWarehouseCatalog(spark, wh, db)
    assert(names == Seq(
      "dim_category", "dim_customer", "dim_date", "dim_product",
      "fact_sales", "mart_category_analysis", "mart_sales_performance",
      "stg_lineitem_clean"))
    names.foreach { n =>
      assert(spark.catalog.tableExists(s"$db.$n"), s"$db.$n missing")
      val typ = spark.sql(s"DESCRIBE TABLE EXTENDED `$db`.`$n`")
        .where("col_name = 'Type'").collect().head.getString(1)
      assert(typ == "EXTERNAL", s"$db.$n registered as $typ, want EXTERNAL")
    }
  }

  test("a new session queries the catalog with zero setup; SQL == view path") {
    Pipeline.registerWarehouseCatalog(spark, wh, db)
    // catalog consumer: fresh session, NO registration call, no temp
    // views — only the shared catalog and a USE
    val consumer = spark.newSession()
    consumer.sql(s"USE `$db`")
    // view path in ANOTHER fresh session (temp views are session-scoped,
    // so this can't collide with other suites' views)
    val viewer = spark.newSession()
    Pipeline.registerWarehouse(viewer, wh)
    ReferenceQueries.names.foreach { q =>
      val got = canon(consumer.sql(ReferenceQueries.sql(q)))
      assert(got.nonEmpty, s"$q returned no rows through the catalog")
      assert(got == canon(viewer.sql(ReferenceQueries.sql(q))),
        s"$q: catalog path != temp-view path")
    }
  }

  test("re-registration serves a republished table's drifted schema") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_wh_drift").toString
    Seq((1L, "a")).toDF("k", "v").write.parquet(s"$dir/probe")
    assert(Pipeline.registerWarehouseCatalog(spark, dir, "graft_drift") ==
      Seq("probe"))
    assert(spark.table("graft_drift.probe").columns.toSeq == Seq("k", "v"))
    // republish with a drifted column list; the catalog's inferred
    // schema is now stale until re-registration drops and re-creates
    Seq((1L, "a", 0.5)).toDF("k", "v", "w")
      .write.mode("overwrite").parquet(s"$dir/probe")
    Pipeline.registerWarehouseCatalog(spark, dir, "graft_drift")
    assert(spark.table("graft_drift.probe").columns.toSeq == Seq("k", "v", "w"))
  }

  test("DROP TABLE on the external entry leaves the parquet untouched") {
    Pipeline.registerWarehouseCatalog(spark, wh, db)
    spark.sql(s"DROP TABLE `$db`.`dim_category`")
    val p = new org.apache.hadoop.fs.Path(s"$wh/dim_category")
    assert(p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p),
      "DROP TABLE deleted the published parquet — table was not external")
    // and the pipeline can re-point the catalog at it at any time
    assert(Pipeline.registerWarehouseCatalog(spark, wh, db)
      .contains("dim_category"))
  }

  test("partitioned artifacts register with recovered partitions and metastore pruning") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_wh_part").toString
    // a month-partitioned publish (the q47 incremental-fact layout)
    Seq((1L, 199501L, 5.0), (2L, 199501L, 6.0), (3L, 199502L, 7.0), (4L, 199503L, 8.0))
      .toDF("k", "month_key", "amt")
      .write.partitionBy("month_key").parquet(s"$dir/fact_part")
    assert(Pipeline.registerWarehouseCatalog(spark, dir, "graft_part") ==
      Seq("fact_part"))
    // the partition column is inferred AND the partition set recovered —
    // without MSCK the catalog relation serves zero rows (measured)
    assert(spark.catalog.listColumns("graft_part.fact_part").collect()
      .exists(c => c.name == "month_key" && c.isPartition))
    assert(spark.sql("SHOW PARTITIONS graft_part.fact_part").count() == 3)
    assert(spark.table("graft_part.fact_part").count() == 4)
    // metastore partition pruning: the sliced query's file index holds
    // ONLY the matching month directory — pruning happened in the
    // catalog before file listing, not as a post-scan filter
    val sliced = spark.table("graft_part.fact_part")
      .filter(org.apache.spark.sql.functions.col("month_key") === 199501L)
    assert(sliced.count() == 2)
    val scans = sliced.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val paths = scans.head.relation.location.inputFiles
    assert(paths.nonEmpty && paths.forall(_.contains("month_key=199501")),
      s"file index not partition-pruned: ${paths.take(3).mkString(",")}")
    // re-registration after a new partition lands re-recovers it
    Seq((5L, 199504L, 9.0)).toDF("k", "month_key", "amt")
      .write.mode("append").partitionBy("month_key").parquet(s"$dir/fact_part")
    Pipeline.registerWarehouseCatalog(spark, dir, "graft_part")
    assert(spark.sql("SHOW PARTITIONS graft_part.fact_part").count() == 4)
    assert(spark.table("graft_part.fact_part").count() == 5)
  }

  test("unsafe database names are rejected before any DDL runs") {
    intercept[IllegalArgumentException] {
      Pipeline.registerWarehouseCatalog(spark, wh, "bad`name; DROP")
    }
  }
}
