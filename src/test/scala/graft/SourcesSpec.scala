package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Fetch, Sinks, Tables}

/** The multi-source extract layer: CSV file source, JSON (REST-payload)
  * source with nested-object flattening, source tagging, column
  * standardization — the reference's extract.py surface.
  */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("csv source: explicit schema, header, source tag") {
    val dir = Files.createTempDirectory("graft_csv").toString
    Files.writeString(java.nio.file.Path.of(s"$dir/sales.csv"),
      "Transaction ID,Total Amount\n1,10.5\n2,20.25\n")
    val schema = StructType(Seq(
      StructField("Transaction ID", LongType), StructField("Total Amount", DoubleType)))
    val df = Tables.standardizeColumns(
      Tables.readCsv(spark, s"$dir/sales.csv", schema, "kaggle_csv"))
    assert(df.columns.toSet == Set("transaction_id", "total_amount", "_source", "_extracted_at"))
    assert(df.count() == 2)
    assert(df.select("_source").distinct().collect().head.getString(0) == "kaggle_csv")
  }

  test("json source: nested struct flattens like the API rating object") {
    val dir = Files.createTempDirectory("graft_json").toString
    Files.writeString(java.nio.file.Path.of(s"$dir/products.json"),
      """{"id":1,"title":"x","rating":{"rate":4.5,"count":120}}
        |{"id":2,"title":"y","rating":{"rate":3.0,"count":7}}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("title", StringType),
      StructField("rating", StructType(Seq(
        StructField("rate", DoubleType), StructField("count", LongType))))))
    val df = Tables.flattenStructs(
      Tables.readJson(spark, s"$dir/products.json", schema, "fake_store_api"))
    assert(df.columns.toSet ==
      Set("id", "title", "rating_rate", "rating_count", "_source", "_extracted_at"))
    assert(df.where("rating_count = 120").count() == 1)
  }

  test("stage-publish roundtrip preserves rows; csv export writes one file") {
    val dir = Files.createTempDirectory("graft_sink").toString
    val df = spark.read.parquet(s"${TestSpark.sf}/region.parquet")
    val n = Sinks.stagePublish(df, s"$dir/region")
    assert(n == df.count())
    assert(spark.read.parquet(s"$dir/region").count() == n)
    Sinks.csvExport(df, s"$dir/region_csv")
    val files = new java.io.File(s"$dir/region_csv").listFiles()
      .filter(_.getName.endsWith(".csv"))
    assert(files.length == 1)
  }

  test("jdbc staging roundtrip against embedded Derby, plain and range-partitioned") {
    val url = "jdbc:derby:memory:graft_stage;create=true"
    val df = spark.read.parquet(s"${TestSpark.sf}/nation.parquet")
    Sinks.jdbcStage(df, url, "stg_nation")
    val back = Sinks.readStaging(spark, url, "stg_nation")
    assert(back.count() == df.count())
    assert(back.selectExpr("cast(n_nationkey as long)").collect()
      .map(_.getLong(0)).sorted.toSeq ==
      df.selectExpr("cast(n_nationkey as long)").collect()
        .map(_.getLong(0)).sorted.toSeq)
    // range-partitioned read-back: same rows, parallel scan
    val part = Sinks.readStaging(spark, url, "stg_nation",
      partitionColumn = "n_nationkey", lowerBound = 0L, upperBound = 25L,
      numPartitions = 4)
    assert(part.rdd.getNumPartitions == 4)
    assert(part.count() == df.count())
  }

  test("catalog lists every table with columns and row counts") {
    val cat = Tables.catalog(spark, TestSpark.sf)
    assert(cat.select("table_name").distinct().count() == Tables.names.length)
    val li = cat.where("table_name = 'lineitem'").collect()
    assert(li.length == 11)
    assert(li.forall(_.getAs[Long]("table_rows") == 6000L))
  }

  test("pipeline stage modes select the right table subsets") {
    val out = java.nio.file.Files.createTempDirectory("graft_modes").toString
    val stg = Pipeline.run(spark, TestSpark.sf, s"$out/a", mode = Pipeline.StagingOnly)
    assert(stg.map(_.table) == Seq("stg_lineitem_clean"))
    val core = Pipeline.run(spark, TestSpark.sf, s"$out/b", mode = Pipeline.SkipMarts)
    assert(core.map(_.table).contains("fact_sales") &&
      !core.map(_.table).exists(_.startsWith("mart_")))
  }

  test("concurrent build-if-missing probes degrade to one winner, never a torn path") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_claimrace").toString
    Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    // both probes released together so their exists-checks race: both
    // build, exactly one claims the final name by no-overwrite rename,
    // the loser deletes its staging and reads the winner
    val start = new java.util.concurrent.CountDownLatch(2)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    def task = new java.util.concurrent.Callable[Seq[(Long, String)]] {
      def call(): Seq[(Long, String)] = {
        start.countDown()
        start.await(10, java.util.concurrent.TimeUnit.SECONDS)
        Sinks.ensureArtifact(spark, "probe_race", dir) {
          Seq((42L, "payload")).toDF("k", "v")
        }.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      }
    }
    try {
      val (f1, f2) = (pool.submit(task), pool.submit(task))
      assert(f1.get() == Seq((42L, "payload")))
      assert(f2.get() == Seq((42L, "payload")))
    } finally pool.shutdown()
    // cleanliness: the family holds the one claimed artifact and no
    // orphaned probe staging dirs
    val fam = new org.apache.hadoop.fs.Path(
      s"${spark.conf.get("spark.sql.warehouse.dir")}/probe_race")
    val fs = fam.getFileSystem(spark.sessionState.newHadoopConf())
    val dirKey = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    val children = fs.listStatus(fam).map(_.getPath.getName).toSeq
      .filter(_.contains(dirKey)) // other runs' temp-dir artifacts share the family
    assert(children.size == 1 && !children.head.contains("_probe_"),
      s"family dir not clean after the race: $children")
  }

  test("sourceKey fingerprint changes when the source file is regenerated") {
    val f = java.nio.file.Files.createTempFile("graft_srckey", ".parquet")
    java.nio.file.Files.writeString(f, "first generation")
    val k1 = graft.sources.Tables.sourceKey(spark, f.toString)
    java.nio.file.Files.writeString(f, "second generation, different size")
    val k2 = graft.sources.Tables.sourceKey(spark, f.toString)
    assert(k1 != k2, "regenerated source must produce a new artifact key")
    // stable when nothing changed
    assert(k2 == graft.sources.Tables.sourceKey(spark, f.toString))
  }

  /** Fake endpoint: fails `failures` times, then serves — the DAG's
    * retries=2 envelope (Fetch reuses Pipeline.withRetries) must absorb
    * exactly two failures and surface a third.
    */
  private class FlakyFetcher(payload: String, failures: Int) extends Fetch.Fetcher {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    def fetch(url: String): String = {
      if (calls.incrementAndGet() <= failures)
        throw new RuntimeException(s"503 from $url")
      payload
    }
  }

  test("fetch seam: retries absorb two failures, then the payload parses") {
    val f = new FlakyFetcher("""{"category_id": 1, "category": "widgets"}
      |{"category_id": 2, "category": "gears"}""".stripMargin, failures = 2)
    val schema = StructType.fromDDL("category_id BIGINT, category STRING")
    val df = Fetch.readJsonPayload(spark, f, "http://fake/categories", schema, "api_rest")
    assert(f.calls.get() == 3, "two failed attempts + one success")
    assert(df.count() == 2)
    assert(df.columns.toSet ==
      Set("category_id", "category", "_source", "_extracted_at"))
  }

  test("fetch seam: a third failure escapes as FetchFailedException") {
    val f = new FlakyFetcher("never served", failures = 3)
    val e = intercept[Fetch.FetchFailedException] {
      Fetch.fetchWithRetries(f, "http://fake/down", retries = 2)
    }
    assert(f.calls.get() == 3, "the retry budget is exactly retries+1 attempts")
    assert(e.getMessage.contains("after 3 attempts"))
  }

  test("fetch seam: a hung endpoint is cut at the per-attempt timeout") {
    val hung = new Fetch.Fetcher {
      def fetch(url: String): String = { Thread.sleep(60000); "too late" }
    }
    val t0 = System.nanoTime()
    intercept[Fetch.FetchFailedException] {
      Fetch.fetchWithRetries(hung, "http://fake/hang", retries = 1, timeoutMs = 300)
    }
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(elapsedMs < 10000, s"2 attempts x 300 ms must not take $elapsedMs ms")
  }

  test("fetch seam: retry backoff doubles per attempt (the DAG's " +
      "retry_delay + retry_exponential_backoff contract)") {
    // failures=2 with delay 120 ms: attempt 1 fails → wait 120 ms,
    // attempt 2 fails → wait 240 ms, attempt 3 serves — the flaky
    // endpoint sees the full doubling schedule (extract.py:74's
    // timeout+retry discipline with the DAG's backoff around it)
    val f = new FlakyFetcher("served", failures = 2)
    val t0 = System.nanoTime()
    val body = Fetch.fetchWithRetries(f, "http://fake/backoff",
      retries = 2, retryDelayMs = 120L)
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(body == "served" && f.calls.get() == 3)
    assert(elapsedMs >= 360.0,
      s"backoff must sleep 120 + 240 ms before the serving attempt, measured $elapsedMs")
    // no trailing sleep after the final failure: the budget-exhausted
    // path surfaces immediately (2 × 80 ms of backoff, then throw)
    val dead = new FlakyFetcher("never", failures = 3)
    val t1 = System.nanoTime()
    intercept[Fetch.FetchFailedException] {
      Fetch.fetchWithRetries(dead, "http://fake/dead",
        retries = 2, retryDelayMs = 80L)
    }
    val deadMs = (System.nanoTime() - t1) / 1e6
    assert(deadMs >= 240.0 && deadMs < 5000.0,
      s"exhausted budget: 80 + 160 ms backoff then immediate throw, measured $deadMs")
  }

  test("fetch seam: top-level JSON array parses as one row per element") {
    val arr = new Fetch.Fetcher {
      def fetch(url: String): String =
        "[\n  {\"category_id\": 1, \"category\": \"a\"},\n  {\"category_id\": 2, \"category\": \"b\"}\n]\n"
    }
    val schema = StructType.fromDDL("category_id BIGINT, category STRING")
    val rows = Fetch.readJsonPayload(spark, arr, "http://fake/list", schema, "api_rest")
      .select("category_id", "category").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).sorted.toSeq ==
      Seq((1L, "a"), (2L, "b")))
  }

  test("q34/q37 extract through an injected fetcher (the live-API drop-in)") {
    // a recording pass-through proves the operators consume the seam:
    // same results as the default path, and the fetcher was actually hit
    val inner = new Fetch.FileFetcher(spark.sessionState.newHadoopConf())
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val recording = new Fetch.Fetcher {
      def fetch(url: String): String = { calls.incrementAndGet(); inner.fetch(url) }
    }
    val viaSeam = graft.operators.Cleaning
      .apiCategoryListVia(spark, TestSpark.sf, recording)
      .select("category", "category_id", "n_products").collect().toSet
    val default = graft.operators.Cleaning.apiCategoryList(spark, TestSpark.sf)
      .select("category", "category_id", "n_products").collect().toSet
    assert(calls.get() == 1 && viaSeam == default)

    val feed = graft.operators.Cleaning
      .apiRatingsFeed(spark, TestSpark.sf, recording)
    assert(feed.count() > 0 && calls.get() == 2)
    assert(feed.columns.toSet == Set("product_id", "rating_rate", "rating_count"))
  }
}
