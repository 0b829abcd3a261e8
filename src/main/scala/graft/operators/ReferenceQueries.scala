package graft.operators

/** The reference's SQL-facing surface, verbatim-shaped: the eight
  * analytical queries its users run against the warehouse
  * (/root/reference/sql/analytical_queries.sql:6-142), re-expressed as
  * Spark SQL over the tables [[graft.Pipeline.registerWarehouse]]
  * registers (`fact_sales`, `dim_date`, `dim_customer`,
  * `dim_category`, `dim_product`). A reference user's workflow —
  * build the warehouse, then query it in SQL — works end-to-end:
  *
  * {{{
  *   Pipeline.run(spark, srcDir, whDir)
  *   Pipeline.registerWarehouse(spark, whDir)
  *   spark.sql(ReferenceQueries.sql("r1_monthly_sales_trend"))
  * }}}
  *
  * Documented adaptations from the reference text (the data model
  * differs, the query shapes don't):
  *  - revenue is the fact's line-grain `net_amount` (the reference's
  *    fact is transaction-grain `total_amount`);
  *  - demographic slices (gender / age_group, which the TPC-H-shaped
  *    sources don't carry) map to the behavioral dims the warehouse
  *    does: `customer_segment` / `balance_band`;
  *  - dim_product carries the SCD2 conformed `price`, not API rating
  *    columns, so the catalog overview reports price stats only;
  *  - every ORDER BY gains a deterministic tie-break column and the
  *    top-N query breaks revenue ties by customer_id — the reference's
  *    un-tied LIMIT 20 is nondeterministic under parallel execution;
  *  - money sums run in the decimal domain (DECIMAL(18,6) per line)
  *    before the final 2-decimal rounding — double summation is
  *    order-dependent, and a warehouse query must return the same
  *    numbers at any parallelism (WarehouseSqlSpec pins each query
  *    against an independently-expressed DataFrame twin).
  */
object ReferenceQueries {
  import org.apache.spark.sql.{Column, DataFrame, SparkSession}
  import org.apache.spark.sql.expressions.Window
  import org.apache.spark.sql.functions._

  /** Queries in the reference file's order, keyed r1..r8. */
  val names: Seq[String] = Seq(
    "r1_monthly_sales_trend", "r2_category_performance",
    "r3_customer_segmentation", "r4_segment_sales",
    "r5_weekend_weekday", "r6_top_customers",
    "r7_product_catalog", "r8_quarterly_yoy")

  val sql: Map[String, String] = Map(
    // ── 1. Monthly Sales Trend (analytical_queries.sql:6-27) ──────────
    "r1_monthly_sales_trend" ->
      """WITH m AS (
        |  SELECT d.year, d.month, d.month_name,
        |         SUM(CAST(f.net_amount AS DECIMAL(18,6))) AS rev_dec,
        |         COUNT(DISTINCT f.transaction_id) AS total_transactions,
        |         SUM(f.quantity) AS total_units_sold,
        |         COUNT(DISTINCT f.customer_id) AS unique_customers
        |  FROM fact_sales f
        |  JOIN dim_date d ON f.date_key = d.date_key
        |  GROUP BY d.year, d.month, d.month_name),
        |w AS (
        |  SELECT *, LAG(rev_dec) OVER (ORDER BY year, month) AS prev_dec FROM m)
        |SELECT year, month, month_name,
        |       CAST(ROUND(rev_dec, 2) AS DOUBLE) AS total_revenue,
        |       total_transactions, total_units_sold,
        |       CAST(ROUND(rev_dec / total_transactions, 2) AS DOUBLE) AS avg_order_value,
        |       unique_customers,
        |       CAST(ROUND(prev_dec, 2) AS DOUBLE) AS prev_month_revenue,
        |       CAST(ROUND((rev_dec - prev_dec) / nullif(prev_dec, 0) * 100, 2) AS DOUBLE) AS mom_growth_pct
        |FROM w
        |ORDER BY year, month""".stripMargin,
    // ── 2. Category Performance (analytical_queries.sql:30-46) ────────
    "r2_category_performance" ->
      """WITH m AS (
        |  SELECT f.product_category,
        |         SUM(CAST(f.net_amount AS DECIMAL(18,6))) AS rev_dec,
        |         COUNT(DISTINCT f.transaction_id) AS total_transactions,
        |         SUM(f.quantity) AS total_quantity,
        |         SUM(CAST(f.price AS DECIMAL(18,6))) AS price_dec,
        |         COUNT(*) AS n_lines,
        |         COUNT(DISTINCT f.customer_id) AS unique_customers
        |  FROM fact_sales f
        |  GROUP BY f.product_category)
        |SELECT m.product_category, c.category_group,
        |       CAST(ROUND(rev_dec, 2) AS DOUBLE) AS total_revenue,
        |       CAST(ROUND(rev_dec / SUM(rev_dec) OVER () * 100, 2) AS DOUBLE) AS revenue_share_pct,
        |       total_transactions, total_quantity,
        |       CAST(ROUND(price_dec / n_lines, 2) AS DOUBLE) AS avg_unit_price,
        |       unique_customers
        |FROM m LEFT JOIN dim_category c ON m.product_category = c.category_name
        |ORDER BY total_revenue DESC, m.product_category""".stripMargin,
    // ── 3. Customer Segmentation (analytical_queries.sql:49-64) ───────
    "r3_customer_segmentation" ->
      """SELECT c.customer_segment, c.balance_band,
        |       COUNT(DISTINCT c.customer_id) AS customer_count,
        |       CAST(ROUND(SUM(CAST(f.net_amount AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_revenue,
        |       CAST(ROUND(AVG(CAST(f.net_amount AS DECIMAL(18,6))), 2) AS DOUBLE) AS avg_line_amount,
        |       SUM(f.quantity) AS total_quantity,
        |       CAST(ROUND(AVG(c.total_transactions), 1) AS DOUBLE) AS avg_purchases_per_customer
        |FROM fact_sales f
        |JOIN dim_customer c
        |  ON f.customer_key = c.customer_key AND c.is_current = TRUE
        |GROUP BY c.customer_segment, c.balance_band
        |ORDER BY c.customer_segment, c.balance_band""".stripMargin,
    // ── 4. Demographic sales analysis (analytical_queries.sql:67-77;
    //      gender → customer_segment, the behavioral demographic the
    //      warehouse carries) ──────────────────────────────────────────
    "r4_segment_sales" ->
      """SELECT c.customer_segment, f.product_category,
        |       CAST(ROUND(SUM(CAST(f.net_amount AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_revenue,
        |       COUNT(DISTINCT f.transaction_id) AS total_transactions,
        |       CAST(ROUND(SUM(CAST(f.net_amount AS DECIMAL(18,6))) / COUNT(DISTINCT f.transaction_id), 2) AS DOUBLE) AS avg_order_value,
        |       CAST(ROUND(AVG(CAST(c.acctbal AS DECIMAL(12,2))), 1) AS DOUBLE) AS avg_acctbal
        |FROM fact_sales f
        |JOIN dim_customer c
        |  ON f.customer_key = c.customer_key AND c.is_current = TRUE
        |GROUP BY c.customer_segment, f.product_category
        |ORDER BY c.customer_segment, total_revenue DESC, f.product_category""".stripMargin,
    // ── 5. Weekend vs Weekday (analytical_queries.sql:80-89) ──────────
    "r5_weekend_weekday" ->
      """SELECT CASE WHEN d.is_weekend THEN 'Weekend' ELSE 'Weekday' END AS day_type,
        |       d.day_name, d.day_of_week,
        |       CAST(ROUND(SUM(CAST(f.net_amount AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_revenue,
        |       COUNT(DISTINCT f.transaction_id) AS total_transactions,
        |       CAST(ROUND(SUM(CAST(f.net_amount AS DECIMAL(18,6))) / COUNT(DISTINCT f.transaction_id), 2) AS DOUBLE) AS avg_order_value
        |FROM fact_sales f
        |JOIN dim_date d ON f.date_key = d.date_key
        |GROUP BY day_type, d.day_name, d.day_of_week
        |ORDER BY d.day_of_week""".stripMargin,
    // ── 6. Top Customers by Revenue (analytical_queries.sql:92-110) ───
    "r6_top_customers" ->
      """SELECT c.customer_id, c.customer_name, c.segment_attr, c.balance_band,
        |       c.customer_segment, c.total_transactions,
        |       CAST(ROUND(SUM(CAST(f.net_amount AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_revenue,
        |       SUM(f.quantity) AS total_quantity,
        |       CAST(ROUND(SUM(CAST(f.net_amount AS DECIMAL(18,6))) / COUNT(DISTINCT f.transaction_id), 2) AS DOUBLE) AS avg_order_value
        |FROM fact_sales f
        |JOIN dim_customer c
        |  ON f.customer_key = c.customer_key AND c.is_current = TRUE
        |GROUP BY c.customer_id, c.customer_name, c.segment_attr, c.balance_band,
        |         c.customer_segment, c.total_transactions
        |ORDER BY total_revenue DESC, c.customer_id
        |LIMIT 20""".stripMargin,
    // ── 7. Product Catalog Overview (analytical_queries.sql:113-125) ──
    "r7_product_catalog" ->
      """SELECT p.product_category,
        |       COUNT(*) AS product_count,
        |       CAST(ROUND(AVG(CAST(p.price AS DECIMAL(12,2))), 2) AS DOUBLE) AS avg_price,
        |       CAST(ROUND(MIN(p.price), 2) AS DOUBLE) AS min_price,
        |       CAST(ROUND(MAX(p.price), 2) AS DOUBLE) AS max_price
        |FROM dim_product p
        |WHERE p.is_current = TRUE
        |GROUP BY p.product_category
        |ORDER BY product_count DESC, p.product_category""".stripMargin,
    // ── 8. Quarterly YoY (analytical_queries.sql:128-142) ─────────────
    "r8_quarterly_yoy" ->
      """WITH q AS (
        |  SELECT d.year, d.quarter,
        |         SUM(CAST(f.net_amount AS DECIMAL(18,6))) AS rev_dec,
        |         COUNT(DISTINCT f.transaction_id) AS quarterly_transactions,
        |         COUNT(DISTINCT f.customer_id) AS quarterly_customers
        |  FROM fact_sales f
        |  JOIN dim_date d ON f.date_key = d.date_key
        |  GROUP BY d.year, d.quarter),
        |w AS (
        |  SELECT *, LAG(rev_dec, 4) OVER (ORDER BY year, quarter) AS prev_dec FROM q)
        |SELECT year, quarter,
        |       CAST(ROUND(rev_dec, 2) AS DOUBLE) AS quarterly_revenue,
        |       quarterly_transactions, quarterly_customers,
        |       CAST(ROUND(prev_dec, 2) AS DOUBLE) AS same_quarter_prev_year,
        |       CAST(ROUND((rev_dec - prev_dec) / nullif(prev_dec, 0) * 100, 2) AS DOUBLE) AS yoy_growth_pct
        |FROM w
        |ORDER BY year, quarter""".stripMargin)

  // ─── r_sql_parity: the r1–r8 surface under the driver's gate ────────

  private def dec(c: String) = col(c).cast("decimal(18,6)")
  private def r2d(c: Column) = round(c, 2).cast("double")
  private def nullifZero(c: Column) = when(c === 0, lit(null)).otherwise(c)

  /** Independently-expressed DataFrame twin of each reference query —
    * the same semantics written as DataFrame ops over the BUILDER
    * frames (never through the SQL text under test). WarehouseSqlSpec
    * pins SQL-over-published-parquet against these; [[rSqlParity]]
    * pins SQL-over-in-memory-views against them per round under the
    * driver's CORRECTNESS gate (round-13 verdict item 6: the r SQL
    * strings never ran under the DuckDB loop).
    */
  private[graft] def twin(name: String, spark: SparkSession, dir: String): DataFrame =
    twinOf(name, Facts.factSales(spark, dir), Dimensions.dimDate(spark, dir),
      Dimensions.dimCustomerHashed(spark, dir), spark, dir)

  private[graft] def twinOf(name: String, fact: DataFrame, dimDate: DataFrame,
      dimCust: DataFrame, spark: SparkSession, dir: String): DataFrame = {
    name match {
      case "r1_monthly_sales_trend" =>
        val m = fact.join(dimDate, Seq("date_key"))
          .groupBy(col("year"), col("month"), col("month_name"))
          .agg(sum(dec("net_amount")).as("rev_dec"),
            countDistinct(col("transaction_id")).as("total_transactions"),
            sum(col("quantity")).as("total_units_sold"),
            countDistinct(col("customer_id")).as("unique_customers"))
        val w = Window.orderBy(col("year"), col("month"))
        m.withColumn("prev_dec", lag(col("rev_dec"), 1).over(w))
          .select(col("year"), col("month"), col("month_name"),
            r2d(col("rev_dec")).as("total_revenue"),
            col("total_transactions"), col("total_units_sold"),
            r2d(col("rev_dec") / col("total_transactions")).as("avg_order_value"),
            col("unique_customers"),
            r2d(col("prev_dec")).as("prev_month_revenue"),
            r2d((col("rev_dec") - col("prev_dec")) / nullifZero(col("prev_dec")) * 100)
              .as("mom_growth_pct"))
      case "r2_category_performance" =>
        val m = fact.groupBy(col("product_category"))
          .agg(sum(dec("net_amount")).as("rev_dec"),
            countDistinct(col("transaction_id")).as("total_transactions"),
            sum(col("quantity")).as("total_quantity"),
            sum(dec("price")).as("price_dec"),
            count(lit(1)).as("n_lines"),
            countDistinct(col("customer_id")).as("unique_customers"))
        val cat = Facts.dimCategory(spark, dir)
        m.join(cat, m("product_category") === cat("category_name"), "left")
          .select(col("product_category"), col("category_group"),
            r2d(col("rev_dec")).as("total_revenue"),
            r2d(col("rev_dec") / sum(col("rev_dec")).over(Window.partitionBy()) * 100)
              .as("revenue_share_pct"),
            col("total_transactions"), col("total_quantity"),
            r2d(col("price_dec") / col("n_lines")).as("avg_unit_price"),
            col("unique_customers"))
      case "r3_customer_segmentation" =>
        val dc = dimCust.where(col("is_current"))
        // customer_id exists on BOTH sides of the join (fact carries the
        // degenerate o_custkey); count the dim's — same values, but the
        // unqualified name would fail resolution
        fact.join(dc, Seq("customer_key"))
          .groupBy(col("customer_segment"), col("balance_band"))
          .agg(countDistinct(dc("customer_id")).as("customer_count"),
            r2d(sum(dec("net_amount"))).as("total_revenue"),
            r2d(avg(dec("net_amount"))).as("avg_line_amount"),
            sum(col("quantity")).as("total_quantity"),
            round(avg(col("total_transactions")), 1).cast("double")
              .as("avg_purchases_per_customer"))
      case "r4_segment_sales" =>
        fact.join(dimCust.where(col("is_current")), Seq("customer_key"))
          .groupBy(col("customer_segment"), col("product_category"))
          .agg(r2d(sum(dec("net_amount"))).as("total_revenue"),
            countDistinct(col("transaction_id")).as("total_transactions"),
            r2d(sum(dec("net_amount")) / countDistinct(col("transaction_id")))
              .as("avg_order_value"),
            round(avg(col("acctbal").cast("decimal(12,2)")), 1).cast("double")
              .as("avg_acctbal"))
      case "r5_weekend_weekday" =>
        fact.join(dimDate, Seq("date_key"))
          .groupBy(
            when(col("is_weekend"), "Weekend").otherwise("Weekday").as("day_type"),
            col("day_name"), col("day_of_week"))
          .agg(r2d(sum(dec("net_amount"))).as("total_revenue"),
            countDistinct(col("transaction_id")).as("total_transactions"),
            r2d(sum(dec("net_amount")) / countDistinct(col("transaction_id")))
              .as("avg_order_value"))
      case "r6_top_customers" =>
        val dc = dimCust.where(col("is_current"))
        fact.join(dc, Seq("customer_key"))
          .groupBy(dc("customer_id"), col("customer_name"),
            col("segment_attr"), col("balance_band"),
            col("customer_segment"), col("total_transactions"))
          .agg(r2d(sum(dec("net_amount"))).as("total_revenue"),
            sum(col("quantity")).as("total_quantity"),
            r2d(sum(dec("net_amount")) / countDistinct(col("transaction_id")))
              .as("avg_order_value"))
          .orderBy(col("total_revenue").desc, dc("customer_id"))
          .limit(20)
      case "r7_product_catalog" =>
        Dimensions.dimProduct(spark, dir)
          .where(col("is_current"))
          .groupBy(col("product_category"))
          .agg(count(lit(1)).as("product_count"),
            round(avg(col("price").cast("decimal(12,2)")), 2).cast("double")
              .as("avg_price"),
            r2d(min(col("price"))).as("min_price"),
            r2d(max(col("price"))).as("max_price"))
      case "r8_quarterly_yoy" =>
        val q = fact.join(dimDate, Seq("date_key"))
          .groupBy(col("year"), col("quarter"))
          .agg(sum(dec("net_amount")).as("rev_dec"),
            countDistinct(col("transaction_id")).as("quarterly_transactions"),
            countDistinct(col("customer_id")).as("quarterly_customers"))
        val w = Window.orderBy(col("year"), col("quarter"))
        q.withColumn("prev_dec", lag(col("rev_dec"), 4).over(w))
          .select(col("year"), col("quarter"),
            r2d(col("rev_dec")).as("quarterly_revenue"),
            col("quarterly_transactions"), col("quarterly_customers"),
            r2d(col("prev_dec")).as("same_quarter_prev_year"),
            r2d((col("rev_dec") - col("prev_dec")) / nullifZero(col("prev_dec")) * 100)
              .as("yoy_growth_pct"))
      case other => sys.error(s"no twin for $other")
    }
  }

  /** Canonical small-frame image: column-name-sorted, values
    * stringified, rows sorted — the driver's own compare discipline.
    * Bounded: every reference query returns ≤ a few hundred rows
    * (grouped aggregates / LIMIT 20).
    */
  private def canon(df: DataFrame): Seq[Seq[String]] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect().toSeq
      .map(_.toSeq.map(v => if (v == null) "∅" else v.toString))
      .sortBy(_.mkString("|"))
  }

  /** Driver row `r_sql_parity`: run every reference SQL query through
    * `spark.sql` over the registered warehouse views and exact-compare
    * against its independent DataFrame twin; emit one row per query
    * with the SQL result's row count and the match flag. The DuckDB
    * oracle independently derives each query's expected GROUP
    * cardinality from the raw tables and pins `matches` TRUE — so a
    * drift in either the SQL dialect surface or the twin semantics
    * turns the row red in the round's CORRECTNESS file. Driver-side
    * loop over 8 bounded frames — not a distributed operator, a
    * conformance harness (the q39 bounded-collect rule).
    */
  def rSqlParity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // build each warehouse frame ONCE and persist the multiply-consumed
    // ones: the fact feeds 7 SQL queries AND 7 twins (14 consumers —
    // unpersisted, the first cut rebuilt it per consumer and the row
    // cost 43 s at sf0.1; cached it is ~6 s). The temp views register
    // over the SAME cached frames, so the SQL side reads the cache too
    // (in-memory, pre-publish — the publish/registration seam itself is
    // WarehouseSqlSpec / WarehouseCatalogSpec territory).
    // the explicit keyed repartition before persist is load-bearing:
    // AQE coalesces the cache-building plan's output to the 64 MB
    // advisory, so an sf0.1 fact caches as ~1 block and every
    // aggregate over it runs single-threaded (measured 1.5-2.1 s per
    // cached-scan aggregate vs 0.3 s at explicit width — the inverse
    // of the round-11 partitions-proportional-to-data lesson: a
    // CPU-heavy consumer set needs the cache wide even when the bytes
    // are small). Width = the session's shuffle parallelism.
    val w = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val fact = Facts.factSales(spark, dir)
      .repartition(w, col("transaction_id")).persist()
    val dimDate = Dimensions.dimDate(spark, dir).persist()
    val dimCust = Dimensions.dimCustomerHashed(spark, dir).persist()
    // dim_product is consumed twice (the r7 view + the r7 twin) and its
    // SCD2 build is the most expensive dim (~1 s at sf0.1 — the q31
    // row); persisted like the fact. dim_category is a ~150-row frame
    // consumed twice as well — persisting it costs nothing and saves a
    // part-table rebuild.
    val dimProd = Dimensions.dimProduct(spark, dir).persist()
    val dimCat = Facts.dimCategory(spark, dir).persist()
    fact.createOrReplaceTempView("fact_sales")
    dimDate.createOrReplaceTempView("dim_date")
    dimCust.createOrReplaceTempView("dim_customer")
    dimProd.createOrReplaceTempView("dim_product")
    dimCat.createOrReplaceTempView("dim_category")
    try {
      // All driver-side orchestration below runs on a small thread pool
      // (guide §2.6: overlap independent jobs). Two waves:
      //   wave 1 — build every cache with ONE action each, the five
      //   builds overlapped (they are independent source scans); doing
      //   this BEFORE the fan-out means concurrent consumers never race
      //   to materialize the same cache partition (racing tasks would
      //   each recompute the block).
      //   wave 2 — the 16 jobs (8 SQL + 8 twins), each an INDEPENDENT
      //   bounded-result aggregate over the shared caches. Sequential,
      //   this row paid 16 × (driver planning + job latency + straggler
      //   tail) ≈ 21 s solo-warm at sf0.1; overlapped it pays roughly
      //   the longest chain — planning is per-thread driver work and
      //   the small jobs back-fill each other's tails. Results are
      //   per-name and order-preserved; the comparison itself is
      //   driver-local string canonicalization.
      val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      def awaitAll[T](fs: Seq[scala.concurrent.Future[T]]): Seq[T] =
        fs.map(scala.concurrent.Await.result(_,
          scala.concurrent.duration.Duration.Inf))
      try {
        awaitAll(Seq(fact, dimDate, dimCust, dimProd, dimCat).map(f =>
          scala.concurrent.Future {
            f.write.format("noop").mode("overwrite").save()
          }))
        val futs = names.map { name =>
          val fSql = scala.concurrent.Future {
            spark.sparkContext.setJobDescription(s"r_sql_parity: $name sql")
            canon(spark.sql(sql(name)))
          }
          val fTwin = scala.concurrent.Future {
            spark.sparkContext.setJobDescription(s"r_sql_parity: $name twin")
            canon(twinOf(name, fact, dimDate, dimCust, spark, dir))
          }
          (name, fSql, fTwin)
        }
        futs.map { case (name, fSql, fTwin) =>
          val viaSql = scala.concurrent.Await.result(fSql,
            scala.concurrent.duration.Duration.Inf)
          val viaTwin = scala.concurrent.Await.result(fTwin,
            scala.concurrent.duration.Duration.Inf)
          (name, viaSql.size.toLong, viaSql == viaTwin)
        }.toDF("query", "n_rows", "matches")
      } finally {
        // quiesce before the outer finally unpersists (r14 advice): on
        // a failure path Await rethrows while sibling collects still
        // run against the caches — shutdownNow interrupts them and the
        // bounded wait lets them exit before cache release, so the
        // real failure isn't interleaved with recompute noise
        pool.shutdownNow()
        pool.awaitTermination(60, java.util.concurrent.TimeUnit.SECONDS): Unit
      }
      // safe to release before returning: both sides are COLLECTED
      // above — the returned frame is driver-local rows, not a lazy
      // plan over the caches
    } finally {
      fact.unpersist(); dimDate.unpersist(); dimCust.unpersist()
      dimProd.unpersist(); dimCat.unpersist(): Unit
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r_sql_parity" -> ((s, dir) => rSqlParity(s, dir)))

  val oracle: Map[String, String] = Map(
    "r_sql_parity" ->
      // expected row counts derived straight from the raw tables (the
      // warehouse construction preserves these grains: fact = lineitem ⋈
      // orders ⋈ part, dims are 1:1 on their natural keys, every dim row
      // is current in the initial load); matches is pinned TRUE
      """WITH fgrain AS (
        |  SELECT o_orderdate, o_custkey, p_type
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN part ON l_partkey = p_partkey),
        |seg AS (
        |  SELECT c_custkey,
        |         CASE WHEN count(o_orderkey) <= 1 THEN 'New'
        |              WHEN count(o_orderkey) <= 3 THEN 'Occasional'
        |              WHEN count(o_orderkey) <= 5 THEN 'Regular'
        |              ELSE 'Loyal' END AS customer_segment,
        |         CASE WHEN any_value(c_acctbal) < 0 THEN 'Debt'
        |              WHEN any_value(c_acctbal) < 2500 THEN 'Low'
        |              WHEN any_value(c_acctbal) < 5000 THEN 'Mid'
        |              WHEN any_value(c_acctbal) < 7500 THEN 'High'
        |              ELSE 'Premium' END AS balance_band
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |SELECT 'r1_monthly_sales_trend' AS query,
        |       (SELECT count(*) FROM (SELECT DISTINCT year(o_orderdate), month(o_orderdate) FROM fgrain)) AS n_rows,
        |       TRUE AS matches
        |UNION ALL SELECT 'r2_category_performance',
        |       (SELECT count(DISTINCT p_type) FROM fgrain), TRUE
        |UNION ALL SELECT 'r3_customer_segmentation',
        |       (SELECT count(*) FROM (SELECT DISTINCT customer_segment, balance_band
        |                              FROM seg JOIN fgrain ON c_custkey = o_custkey)), TRUE
        |UNION ALL SELECT 'r4_segment_sales',
        |       (SELECT count(*) FROM (SELECT DISTINCT customer_segment, p_type
        |                              FROM seg JOIN fgrain ON c_custkey = o_custkey)), TRUE
        |UNION ALL SELECT 'r5_weekend_weekday',
        |       (SELECT count(DISTINCT isodow(o_orderdate)) FROM fgrain), TRUE
        |UNION ALL SELECT 'r6_top_customers',
        |       (SELECT least(20, count(DISTINCT o_custkey)) FROM fgrain), TRUE
        |UNION ALL SELECT 'r7_product_catalog',
        |       (SELECT count(DISTINCT p_type) FROM part), TRUE
        |UNION ALL SELECT 'r8_quarterly_yoy',
        |       (SELECT count(*) FROM (SELECT DISTINCT year(o_orderdate), quarter(o_orderdate) FROM fgrain)), TRUE""".stripMargin)
}
