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
}
