package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("full warehouse build writes all tables and reports stats") {
    val out = Files.createTempDirectory("graft_wh").toString
    val stats = Pipeline.run(spark, TestSpark.sf, out)
    assert(stats.map(_.table) == Seq(
      "stg_lineitem_clean", "dim_date", "dim_customer", "dim_category",
      "dim_product", "fact_sales",
      "mart_sales_performance", "mart_category_analysis"))
    assert(stats.forall(_.rows > 0))
    // published tables are readable and consistent
    val fact = spark.read.parquet(s"$out/fact_sales")
    val dimC = spark.read.parquet(s"$out/dim_customer")
    assert(fact.count() == stats.find(_.table == "fact_sales").get.rows)
    // every fact customer_key resolves against the dim (referential integrity)
    val orphans = fact.join(dimC, Seq("customer_key"), "left_anti").count()
    assert(orphans == 0)
    val log = Pipeline.runLog(spark, stats, "test_run")
    assert(log.where("status = 'SUCCESS'").count() == stats.length)
  }

  test("curation build publishes the training-data tables behind the corpus gate") {
    val out = Files.createTempDirectory("graft_wh_cur").toString
    val stats = Pipeline.run(spark, TestSpark.sf, out, mode = Pipeline.CurationRun)
    assert(stats.map(_.table) == Seq(
      "corpus_quality", "dedup_removals", "simhash_removals", "dup_clusters",
      "decontamination", "effective_mixture", "curation_funnel",
      "shard_dedup_report", "semantic_removals", "boilerplate_census",
      "pii_scrub", "corpus_splits", "dsir_weights", "training_corpus"))
    assert(stats.forall(_.rows > 0))
    // the published funnel equals the operator's direct result
    val published = spark.read.parquet(s"$out/curation_funnel")
    val direct = graft.operators.Dedup.curationFunnel(spark, TestSpark.sf)
    assert(published.collect().map(_.toSeq).sortBy(_.toString).toSeq ==
      direct.collect().map(_.toSeq).sortBy(_.toString).toSeq)
    // removal list and clusters reconcile: every removed doc is clustered
    val removals = spark.read.parquet(s"$out/dedup_removals")
    val clusters = spark.read.parquet(s"$out/dup_clusters")
    assert(removals.count() > 0 && clusters.count() > 0)
  }

  test("incremental fact run == full rebuild, and re-running a slice is idempotent") {
    import org.apache.spark.sql.functions.col
    val out = Files.createTempDirectory("graft_wh_inc").toString
    // three calendar slices cover the whole span (synthetic orders run
    // 1995-2001), plus an empty leading slice — a day with no orders is
    // legal daily input and must load as 0 rows, not fail
    val slices = Seq((19900101L, 19941231L), (0L, 19971231L),
      (19980101L, 19991231L), (20000101L, 99999999L))
    val stats = Pipeline.incrementalFactRun(spark, TestSpark.sf, out, slices)
    assert(stats.size == 4)
    assert(stats.head.rows == 0 && stats.tail.forall(_.rows > 0))
    val full = graft.operators.Facts.factSales(spark, TestSpark.sf)
    val inc = spark.read.parquet(s"$out/fact_sales").drop("month_key")
    assert(inc.count() == full.count())
    // exact set equality, both directions
    assert(inc.except(full).count() == 0 && full.except(inc).count() == 0)
    // scheduler retry: re-running the MIDDLE slice rewrites only its
    // partitions — row count unchanged, content unchanged
    Pipeline.incrementalFactRun(spark, TestSpark.sf, out,
      Seq(slices(2)), validateFirst = false)
    val after = spark.read.parquet(s"$out/fact_sales").drop("month_key")
    assert(after.count() == full.count())
    assert(after.except(full).count() == 0)
    // and the partition layout actually prunes: a one-month read
    // touches only that month's directory
    val oneMonth = spark.read.parquet(s"$out/fact_sales")
      .filter(col("month_key") === 199501L)
    assert(oneMonth.count() > 0)
    assert(oneMonth.queryExecution.executedPlan.toString.contains("PartitionFilters"))
  }

  test("day-grain incremental fact: sub-month slices load and re-run idempotently") {
    import org.apache.spark.sql.functions.col
    val out = Files.createTempDirectory("graft_wh_inc_day").toString
    // mid-month bounds — exactly what month grain must REJECT (dynamic
    // overwrite at month grain would silently drop the rest of a
    // touched month) and day grain handles natively
    val slices = Seq((19950101L, 19950110L), (19950111L, 19950120L),
      (19950121L, 19950131L))
    val ex = intercept[IllegalArgumentException] {
      Pipeline.incrementalFactRun(spark, TestSpark.sf, out,
        Seq((19950101L, 19950110L)), validateFirst = false)
    }
    assert(ex.getMessage.contains("month-aligned"))
    val stats = Pipeline.incrementalFactRun(spark, TestSpark.sf, out, slices,
      grain = "day")
    assert(stats.size == 3 && stats.map(_.rows).sum > 0)
    val full = graft.operators.Facts.factSales(spark, TestSpark.sf)
      .filter(col("date_key").between(19950101L, 19950131L))
    // partitioned read-back appends the partition column last; reorder
    // to full's layout (except() compares by position)
    val inc = spark.read.parquet(s"$out/fact_sales")
      .select(full.columns.map(col).toSeq: _*)
    assert(inc.count() == full.count())
    assert(inc.except(full).count() == 0 && full.except(inc).count() == 0)
    // per-day idempotent re-run of the middle slice
    Pipeline.incrementalFactRun(spark, TestSpark.sf, out,
      Seq(slices(1)), validateFirst = false, grain = "day")
    val after = spark.read.parquet(s"$out/fact_sales")
      .select(full.columns.map(col).toSeq: _*)
    assert(after.count() == full.count() && after.except(full).count() == 0)
    // day partitions prune on the partition column
    val oneDay = spark.read.parquet(s"$out/fact_sales")
      .filter(col("date_key") === 19950115L)
    assert(oneDay.queryExecution.executedPlan.toString.contains("PartitionFilters"))
  }

  test("composed daily run: fact increments + shard dedup == one full rebuild") {
    import org.apache.spark.sql.functions.col
    val out = Files.createTempDirectory("graft_wh_daily").toString
    val nShards = 3
    // the daily schedule: an empty leading day (no orders, no docs),
    // then three days each bringing a date slice and a doc shard
    val schedule = Seq(
      Pipeline.DailySlice(19900101L, 19941231L, None),
      Pipeline.DailySlice(0L, 19971231L, Some(0), Some(0)),
      Pipeline.DailySlice(19980101L, 19991231L, Some(1), Some(1)),
      Pipeline.DailySlice(20000101L, 99999999L, Some(2), Some(2)))
    val stats = Pipeline.dailyRun(spark, TestSpark.sf, out, schedule, nShards)
    // 4 fact stats + 3 doc-shard stats + 3 vec-shard stats + the rollup
    assert(stats.size == 11)
    assert(stats.last.table == "dedup_removals_standing")
    // fact side == full rebuild
    val fullFact = graft.operators.Facts.factSales(spark, TestSpark.sf)
    val fact = spark.read.parquet(s"$out/fact_sales").drop("month_key")
    assert(fact.count() == fullFact.count() && fact.except(fullFact).count() == 0)
    // dedup side == full-rebuild removal set
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
    val fullRemovals = graft.operators.Dedup.removalSetOf(docs)
      .collect().map(_.getLong(0)).toSet
    val standing = spark.read.parquet(s"$out/dedup_removals_standing")
      .select(col("removed_doc_id")).collect().map(_.getLong(0)).toSet
    assert(standing == fullRemovals)
    // vector side: the served index covers every embedding exactly once,
    // with union-consistent cell sizes; the bootstrap codebook froze at
    // the first tick
    val nVecs = graft.sources.Tables.embeddings(spark, TestSpark.sf).count()
    val vec0 = graft.operators.Similarity.vecStandingIndex(spark, s"$out/vec_index")
    // materialize before the retry below swaps partitions under the plan
    val vecRows = vec0.collect().map(_.toSeq).toSet
    assert(vecRows.size.toLong == nVecs)
    assert(vec0.select("vec_id").distinct().count() == nVecs)
    assert(vec0.groupBy("centroid_id")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("c"),
        org.apache.spark.sql.functions.max("cell_size").as("s"))
      .where(col("c") =!= col("s")).count() == 0)
    val bookBefore = spark.read.parquet(s"$out/vec_index/codebook")
      .collect().map(_.toSeq.toString).sorted.toSeq
    // scheduler retry: re-running one tick (backfill) changes nothing —
    // it overwrites only its own partitions and rediscovers only pairs
    // other reports already hold; the vector retry re-assigns against
    // the SAME frozen codebook and republishes identical content
    Pipeline.dailyRun(spark, TestSpark.sf, out,
      Seq(Pipeline.DailySlice(19980101L, 19991231L, Some(1), Some(1))), nShards,
      validateFirst = false)
    val factAfter = spark.read.parquet(s"$out/fact_sales").drop("month_key")
    assert(factAfter.count() == fullFact.count())
    val standingAfter = spark.read.parquet(s"$out/dedup_removals_standing")
      .select(col("removed_doc_id")).collect().map(_.getLong(0)).toSet
    assert(standingAfter == fullRemovals)
    val vecAfter = graft.operators.Similarity.vecStandingIndex(spark, s"$out/vec_index")
      .collect().map(_.toSeq).toSet
    assert(vecAfter == vecRows, "vector retry must republish identical content")
    val bookAfter = spark.read.parquet(s"$out/vec_index/codebook")
      .collect().map(_.toSeq.toString).sorted.toSeq
    assert(bookAfter == bookBefore, "a retry must not retrain the codebook")
  }

  test("crash matrix: torn mid-commit states on the fact, band-index, and " +
      "vector tiers heal to the full-rebuild state on the next scheduled run") {
    import org.apache.spark.sql.functions.col
    val nShards = 3
    val schedule = Seq(
      Pipeline.DailySlice(0L, 19971231L, Some(0), Some(0)),
      Pipeline.DailySlice(19980101L, 19991231L, Some(1), Some(1)),
      Pipeline.DailySlice(20000101L, 99999999L, Some(2), Some(2)))
    def snap(out: String): (Set[Seq[Any]], Set[Long], Set[Seq[Any]], Seq[String]) = (
      spark.read.parquet(s"$out/fact_sales").drop("month_key")
        .collect().map(_.toSeq).toSet,
      spark.read.parquet(s"$out/dedup_removals_standing")
        .select(col("removed_doc_id")).collect().map(_.getLong(0)).toSet,
      graft.operators.Similarity.vecStandingIndex(spark, s"$out/vec_index")
        .collect().map(_.toSeq).toSet,
      spark.read.parquet(s"$out/vec_index/codebook")
        .collect().map(_.toSeq.toString).sorted.toSeq)

    // clean one-shot reference
    val ref = Files.createTempDirectory("graft_wh_ref").toString
    Pipeline.dailyRun(spark, TestSpark.sf, ref, schedule, nShards)
    val want = snap(ref)

    // the crashed run: the scheduler died after tick 1, and the death
    // is staged INSIDE each tier's commit protocol — every window of
    // Sinks.stagePublish (staged-not-swapped; swapped-out-not-renamed)
    // plus the fact overwrite's committer debris
    val out = Files.createTempDirectory("graft_wh_crash").toString
    Pipeline.dailyRun(spark, TestSpark.sf, out, schedule.take(1), nShards)
    val hconf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(out).getFileSystem(hconf)
    def path(s: String) = new org.apache.hadoop.fs.Path(s)
    def junkDir(p: String): Unit = {
      fs.mkdirs(path(p))
      val o = fs.create(path(s"$p/part-junk.parquet"), true)
      o.write("not parquet".getBytes("UTF-8")); o.close()
    }

    // FACT tier — crash inside the dynamic partition overwrite: one
    // month partition lost, committer temp debris left behind
    val factParts = fs.listStatus(path(s"$out/fact_sales")).toSeq
      .filter(_.getPath.getName.startsWith("month_key="))
    assert(factParts.nonEmpty)
    fs.delete(factParts.head.getPath, true)
    fs.mkdirs(path(s"$out/fact_sales/_temporary/0"))

    // BAND-INDEX tier — (a) staged-not-swapped on the standing rollup:
    // a dead publisher's staging dir sits beside the (stale) target;
    // (b) torn multi-artifact shard publish: bands/sets landed,
    // removals did not (the crash between ingestShardCore's publishes)
    junkDir(s"$out/dedup_removals_standing_staging_dead0001")
    assert(fs.exists(path(s"$out/dedup_index/bands/shard=0")))
    fs.delete(path(s"$out/dedup_index/removals/shard=0"), true)

    // VECTOR tier — torn publish on the APPEND path: shard-1's
    // assignment vanished mid-swap (its re-assign against the frozen
    // codebook is bit-deterministic, so this window heals to identical
    // content); plus a dead staging dir beside the codebook
    fs.delete(path(s"$out/vec_index/assign/shard=1"), true)
    junkDir(s"$out/vec_index/codebook_staging_dead0002")

    // next scheduled run = the full backfill schedule (the DAG's retry
    // semantics): every tier must converge to the clean-rebuild state
    Pipeline.dailyRun(spark, TestSpark.sf, out, schedule, nShards)
    val got = snap(out)
    assert(got._1 == want._1, "fact tier did not heal")
    assert(got._2 == want._2, "standing removals did not heal")
    assert(got._3 == want._3, "vector index did not heal")
    assert(got._4 == want._4, "codebook must match the clean bootstrap")

    // VECTOR tier, the bootstrap's OWN torn pair: codebook published,
    // shard-0 assignment not (crash between vecIngestCore's two
    // stagePublishes). The heal re-assigns shard 0 against the already-
    // published codebook and republishes BIT-IDENTICAL content — the
    // bootstrap publishes the self-consistent assignTo(shard, codebook)
    // form precisely so this window (and any plain retry of the
    // bootstrap tick) is idempotent; see the vecIngestCore contract.
    fs.delete(path(s"$out/vec_index/assign/shard=0"), true)
    Pipeline.dailyRun(spark, TestSpark.sf, out, schedule, nShards,
      validateFirst = false)
    val afterTorn = snap(out)
    assert(afterTorn._3 == want._3, "torn bootstrap pair did not heal")
    assert(afterTorn._4 == want._4, "torn bootstrap must not retrain the codebook")

    // and the swap window on the ROLLUP itself: target deleted (the
    // delete-then-rename gap), dead staging beside it — a further run
    // republishes it from the standing index
    fs.delete(path(s"$out/dedup_removals_standing"), true)
    Pipeline.dailyRun(spark, TestSpark.sf, out,
      Seq(schedule.head), nShards, validateFirst = false)
    assert(spark.read.parquet(s"$out/dedup_removals_standing")
      .select(col("removed_doc_id")).collect().map(_.getLong(0)).toSet == want._2,
      "rollup swap window did not heal")
    spark.catalog.clearCache()
  }

  test("pre-flight health check catches a missing source before any stage (task_health_check)") {
    val out = Files.createTempDirectory("graft_wh_hc").toString
    // an empty source dir: reachable, but the mode's tables are absent —
    // the health check must fail in metadata time, attributed to itself
    val bad = Files.createTempDirectory("graft_no_tables").toString
    val err = intercept[IllegalArgumentException] {
      Pipeline.runNotified(spark, bad, out, validateFirst = false, runId = "hc_run")
    }
    assert(err.getMessage.contains("task_health_check"))
    assert(err.getMessage.contains("lineitem"))
    val fl = spark.read.parquet(s"$out/_failure_log").collect()
    assert(fl.length == 1 && fl.head.getAs[String]("failed_stage") == "health_check")
    // an entirely unreachable source dir also refuses, with the dir named
    val gone = intercept[IllegalArgumentException] {
      Pipeline.healthCheck(spark, s"$bad/does_not_exist", out)
    }
    assert(gone.getMessage.contains("unreachable"))
    // the happy path is silent
    Pipeline.healthCheck(spark, TestSpark.sf, out)
  }

  test("failed stage writes the failure-log artifact (notify_on_failure)") {
    val out = Files.createTempDirectory("graft_wh_fail").toString
    // a source that PASSES the reachability check (files exist) but
    // whose table is corrupt — the failure must attribute to the stage
    val bad = Files.createTempDirectory("graft_corrupt").toString
    for (t <- Seq("lineitem", "orders", "customer", "part"))
      Files.write(java.nio.file.Paths.get(s"$bad/$t.parquet"),
        "not a parquet file".getBytes)
    val err = intercept[Exception] {
      Pipeline.runNotified(spark, bad, out, validateFirst = false, runId = "fail_run")
    }
    val fl = spark.read.parquet(s"$out/_failure_log").collect()
    assert(fl.length == 1)
    val r = fl.head
    assert(r.getAs[String]("run_id") == "fail_run")
    assert(r.getAs[String]("failed_stage") == "stg_lineitem_clean")
    assert(r.getAs[String]("status") == "FAILED")
    assert(r.getAs[Long]("n_completed_stages") == 0L)
    assert(r.getAs[String]("error_class") == err.getClass.getSimpleName)
  }

  test("stage retry (dag retries=N): transient faults recover, persistent ones carry the attempt count") {
    // transient: fails twice, succeeds on the third attempt
    var calls = 0
    val got = Pipeline.withRetries(2, "flaky") {
      calls += 1
      if (calls < 3) sys.error(s"transient fault $calls")
      42
    }
    assert(got == 42 && calls == 3)
    // persistent: exhausts the budget and reports attempts + root cause
    var always = 0
    val e = intercept[RuntimeException] {
      Pipeline.withRetries(1, "broken") { always += 1; sys.error("still down") }
    }
    assert(always == 2)
    assert(e.getMessage.contains("after 2 attempts") && e.getMessage.contains("still down"))
    // retries=0 (the default) is single-shot — no silent double-execution
    var once = 0
    intercept[RuntimeException] {
      Pipeline.withRetries(0, "once") { once += 1; sys.error("boom") }
    }
    assert(once == 1)
    // a negative budget is a caller bug: pointed error, body never runs
    var never = 0
    val neg = intercept[IllegalArgumentException] {
      Pipeline.withRetries(-1, "negative") { never += 1; 1 }
    }
    assert(never == 0 && neg.getMessage.contains("retries must be >= 0"))
    // retry_delay + exponential backoff (dag default_args): attempts
    // space out as delay, 2*delay — the two gaps of a 3-attempt run
    // with delay=40ms must take >= 120ms total; success path sleeps 0
    var slow = 0
    val t0 = System.nanoTime()
    val v = Pipeline.withRetries(2, "backoff", retryDelayMs = 40L) {
      slow += 1; if (slow < 3) sys.error("transient"); 7
    }
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(v == 7 && slow == 3 && elapsedMs >= 120,
      s"backoff gaps must sum to >= 120 ms, got $elapsedMs")
  }

  test("cleanup_old_logs prunes aged run logs and stale failure logs, keeps fresh ones") {
    val out = Files.createTempDirectory("graft_wh_logs").toString
    val stats = Seq(Pipeline.LoadStat("t1", 1L, 0.1))
    Pipeline.writeRunLog(spark, stats, "run_old", out)
    Pipeline.writeRunLog(spark, stats, "run_new", out)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // age run_old a week back (fs mtime is the retention clock)
    val oldPath = new org.apache.hadoop.fs.Path(s"$out/_run_logs/run_old")
    val weekMs = 7L * 24 * 3600 * 1000
    fs.setTimes(oldPath, System.currentTimeMillis() - 8 * 24 * 3600 * 1000L, -1)
    val deleted = Pipeline.cleanupOldLogs(spark, out, maxAgeMs = weekMs)
    assert(deleted.exists(_.endsWith("run_old")), s"run_old not swept: $deleted")
    assert(!fs.exists(oldPath))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$out/_run_logs/run_new")))
    // the fresh log survives repeated sweeps; nothing else to delete
    assert(Pipeline.cleanupOldLogs(spark, out, maxAgeMs = weekMs).isEmpty)
    // a swept warehouse with no logs dir is a no-op, not an error
    assert(Pipeline.cleanupOldLogs(spark,
      Files.createTempDirectory("graft_empty").toString, weekMs).isEmpty)
  }

  test("post-load validation flags a clobbered artifact (validate_load)") {
    val out = Files.createTempDirectory("graft_wh_pl").toString
    val stats = Pipeline.run(spark, TestSpark.sf, out, mode = Pipeline.StagingOnly)
    // intact warehouse: every check passes (run() itself already gated on this)
    assert(Pipeline.validateLoad(spark, out, stats).forall(_.ok))
    // clobber the published artifact behind the run's back: truncate it
    // to one row, then re-validate against the original stats
    val path = s"$out/stg_lineitem_clean"
    val tmp = s"$out/stg_lineitem_clean__truncated"
    spark.read.parquet(path).limit(1).write.parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(path))
    val checks = Pipeline.validateLoad(spark, out, stats)
    val bad = checks.filterNot(_.ok)
    assert(bad.map(_.table) == Seq("stg_lineitem_clean"))
    assert(bad.head.actual_rows == 1L && bad.head.expected_rows > 1L)
    // a missing artifact is also a failed check, not an exception
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    assert(!Pipeline.validateLoad(spark, out, stats).forall(_.ok))
  }

  test("validate_load catches a silent column-type drift (schema contract)") {
    val out = Files.createTempDirectory("graft_wh_schema").toString
    val stats = Pipeline.run(spark, TestSpark.sf, out)
    // every published table matches its declared contract on a clean run
    val clean = Pipeline.validateLoad(spark, out, stats)
    assert(clean.forall(c => c.ok && c.schema_ok))
    // drift the published dim behind the run's back: the surrogate key
    // becomes a string — SAME row count, silently different type (the
    // drift every stringly-typed export bug produces)
    val drifted = spark.read.parquet(s"$out/dim_category")
      .withColumn("category_key",
        org.apache.spark.sql.functions.col("category_key").cast("string"))
    graft.sources.Sinks.stagePublish(drifted, s"$out/dim_category")
    val checks = Pipeline.validateLoad(spark, out, stats)
    val dc = checks.find(_.table == "dim_category").get
    assert(dc.ok, "row count still matches — exactly why the count gate misses this")
    assert(!dc.schema_ok && dc.schema_diff.contains("category_key"))
    // every other table still passes both gates
    assert(checks.filterNot(_.table == "dim_category")
      .forall(c => c.ok && c.schema_ok))
  }

  test("successful notified run clears the failure artifact") {
    val out = Files.createTempDirectory("graft_wh_ok").toString
    // seed a stale failure artifact, then a clean StagingOnly run removes it
    val bad = Files.createTempDirectory("graft_no_tables2").toString
    intercept[Exception] {
      Pipeline.runNotified(spark, bad, out, validateFirst = false, runId = "stale")
    }
    val stats = Pipeline.runNotified(spark, TestSpark.sf, out,
      mode = Pipeline.StagingOnly, runId = "ok_run")
    assert(stats.map(_.table) == Seq("stg_lineitem_clean"))
    val fs = new org.apache.hadoop.fs.Path(s"$out/_failure_log")
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$out/_failure_log")))
  }

  test("a zero-second stage SLA trips _sla_log without failing the run") {
    val out = Files.createTempDirectory("graft_wh_sla").toString
    // sla = 0 s: every stage breaches (Airflow SLA misses alert, never fail)
    val stats = Pipeline.runNotified(spark, TestSpark.sf, out,
      mode = Pipeline.StagingOnly, runId = "sla_run", stageSlaSeconds = 0.0)
    assert(stats.nonEmpty, "the run itself must succeed")
    val sla = spark.read.parquet(s"$out/_sla_log").collect()
    assert(sla.length == stats.length)
    val r = sla.head
    assert(r.getAs[String]("run_id") == "sla_run")
    assert(r.getAs[String]("stage") == "stg_lineitem_clean")
    assert(r.getAs[Double]("seconds") > 0.0 && r.getAs[Double]("sla_seconds") == 0.0)
    assert(r.getAs[Long]("rows") == stats.head.rows)
    // and a within-budget rerun clears the alert (presence IS the alert)
    Pipeline.runNotified(spark, TestSpark.sf, out,
      mode = Pipeline.StagingOnly, runId = "calm_run", stageSlaSeconds = 1e9)
    val fs = new org.apache.hadoop.fs.Path(s"$out/_sla_log")
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$out/_sla_log")))
  }

  test("dailyRunNotified carries the full alert surface on the operating schedule") {
    val out = Files.createTempDirectory("graft_wh_dailyn").toString
    val stats = Pipeline.dailyRunNotified(spark, TestSpark.sf, out,
      Seq(Pipeline.DailySlice(0L, 19971231L, Some(0), Some(0))), nShards = 3,
      runId = "daily_ok", stageSlaSeconds = 0.0)
    assert(stats.nonEmpty && stats.head.table.startsWith("fact_sales["))
    // success summary rides the daily schedule too
    val s = spark.read.parquet(s"$out/_run_summary").collect().head
    assert(s.getAs[String]("run_id") == "daily_ok")
    assert(s.getAs[Long]("n_stages") == stats.length.toLong)
    assert(s.getAs[Long]("n_sla_breaches") == stats.length.toLong)
    // the 0-second budget tripped _sla_log on every daily stage
    val sla = spark.read.parquet(s"$out/_sla_log").collect()
    assert(sla.length == stats.length)
    assert(sla.exists(_.getAs[String]("stage").startsWith("shard_dedup[")))

    // a failing daily run writes _failure_log attributed to its stage
    val bad = Files.createTempDirectory("graft_no_tables4").toString
    intercept[Exception] {
      Pipeline.dailyRunNotified(spark, bad, s"$out/b",
        Seq(Pipeline.DailySlice(0L, 99999999L, None)), nShards = 3,
        validateFirst = false, runId = "daily_boom")
    }
    val fl = spark.read.parquet(s"$out/b/_failure_log").collect().head
    assert(fl.getAs[String]("run_id") == "daily_boom")
    assert(fl.getAs[String]("status") == "FAILED")
  }

  test("a successful full run publishes the one-row _run_summary") {
    val out = Files.createTempDirectory("graft_wh_summary").toString
    val stats = Pipeline.runNotified(spark, TestSpark.sf, out, runId = "sum_run")
    val s = spark.read.parquet(s"$out/_run_summary").collect()
    assert(s.length == 1, "task_pipeline_summary analog is ONE row")
    val r = s.head
    assert(r.getAs[String]("run_id") == "sum_run")
    assert(r.getAs[String]("status") == "SUCCESS")
    assert(r.getAs[Long]("n_stages") == stats.length.toLong)
    assert(r.getAs[Long]("total_rows") == stats.map(_.rows).sum)
    assert(r.getAs[Double]("total_seconds") > 0.0)
    // gate census: every published table was re-read and passed
    assert(r.getAs[Long]("n_load_checks") == stats.length.toLong)
    assert(r.getAs[Long]("n_load_checks_ok") == stats.length.toLong)
    assert(r.getAs[Long]("n_sla_breaches") == 0L)
    assert(r.getAs[java.sql.Timestamp]("finished_at") != null)

    // a subsequent FAILED run must delete the stale SUCCESS summary
    val bad = Files.createTempDirectory("graft_no_tables3").toString
    intercept[Exception] {
      Pipeline.runNotified(spark, bad, out, validateFirst = false, runId = "boom")
    }
    val fs = new org.apache.hadoop.fs.Path(s"$out/_run_summary")
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$out/_run_summary")),
      "a failure log and a SUCCESS summary must never coexist")
  }
}
