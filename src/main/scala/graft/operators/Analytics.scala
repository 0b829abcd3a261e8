package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Money._
import graft.sources.Tables

/** Analytical query surface of the reference warehouse re-expressed
  * Spark-first on the test-table star schema.
  *
  * Covers the 8 queries in /root/reference/sql/analytical_queries.sql and
  * the dashboard analytics in /root/reference/streamlit_app.py (heatmap
  * pivot, rank/share windows, priority/status matrix), plus two
  * join/aggregation engine baselines (q20, q21).
  *
  * Scale notes (100 TB):
  *  - dims (part, customer, nation, region) are broadcast; only
  *    fact⋈fact joins (lineitem⋈orders on orderkey) shuffle.
  *  - every groupBy benefits from partial (map-side) aggregation; AQE
  *    coalesces post-shuffle partitions.
  *  - unpartitioned windows (share-of-total, MoM lag) run on POST-AGG
  *    rows only (dozens-to-hundreds of rows), never on the fact table.
  *
  * Determinism: money aggregates run in exact DECIMAL (functions.Money)
  * so results are identical under any partition count/order; averages
  * are emitted as rounded-sum/count (never `round(avg)` — decimal
  * midpoints round differently per engine); ranks order on rounded
  * values with key tiebreaks.
  */
object Analytics {

  private def iso_dow(c: Column): Column = ((dayofweek(c) + lit(5)) % lit(7)) + lit(1)
  private def nz(c: Column): Column = when(c === 0.0, lit(null)).otherwise(c)

  // ─── q01 monthly sales trend (analytical_queries.sql:6-26) ───────────
  def monthlySalesTrend(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val m = o.groupBy(
        year(col("o_orderdate")).cast("long").as("year"),
        month(col("o_orderdate")).cast("long").as("month"),
        date_format(col("o_orderdate"), "MMMM").as("month_name"))
      .agg(
        out2(sum(m3(col("o_totalprice")))).as("total_revenue"),
        countDistinct(col("o_orderkey")).as("total_transactions"),
        countDistinct(col("o_custkey")).as("unique_customers"))
    val w = Window.orderBy(col("year"), col("month"))
    m.withColumn("prev_month_revenue", lag(col("total_revenue"), 1).over(w))
      .select(
        col("year"), col("month"), col("month_name"),
        col("total_revenue"),
        col("total_transactions"), col("unique_customers"),
        (col("total_revenue") / col("total_transactions")).as("avg_order_value"),
        col("prev_month_revenue"),
        ((col("total_revenue") - col("prev_month_revenue")) / nz(col("prev_month_revenue")) * 100)
          .as("mom_growth_pct"))
  }

  // ─── q02 category performance w/ share-of-total (sql:29-45) ──────────
  /** Includes the reference's LEFT JOIN through dim_product_category for
    * `category_group` (analytical_queries.sql:34,40-41): the conformed
    * category dim is a ≤#categories-row frame (distinct p_type +
    * keyword classification, Cleaning.categoryGroup), broadcast onto
    * the post-aggregation result — dim join cost is zero at any scale.
    */
  def categoryPerformance(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir).select(col("p_partkey"), col("p_type"))
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    val catDim = p.select(col("p_type").as("product_category")).distinct()
      .withColumn("category_group", Cleaning.categoryGroup(col("product_category")))
    val m = li
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("p_type").as("product_category"))
      .agg(
        sum(net(col("l_extendedprice"), col("l_discount"))).as("rev_dec"),
        countDistinct(col("l_orderkey")).as("total_transactions"),
        sum(col("l_quantity")).as("total_quantity"),
        sum(m2(col("l_extendedprice"))).as("ep_dec"),
        count(lit(1)).as("n_lines"),
        countDistinct(col("o_custkey")).as("unique_customers"),
        countDistinct(col("l_partkey")).as("unique_parts"))
    val wAll = Window.partitionBy() // post-agg: ≤ #categories rows
    m.select(
      col("product_category"),
      out2(col("rev_dec")).as("total_revenue"),
      round(outRaw(col("rev_dec")) / sum(outRaw(col("rev_dec"))).over(wAll) * 100, 2)
        .as("revenue_share_pct"),
      col("total_transactions"), col("total_quantity"),
      (out2(col("ep_dec")) / col("n_lines")).as("avg_unit_price"),
      col("unique_customers"), col("unique_parts"))
      .join(broadcast(catDim), Seq("product_category"), "left")
  }

  // ─── q03 customer segmentation (sql:48-62; transform.py:207-218) ─────
  def customerSegmentation(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val perCust = c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      .agg(
        count(col("o_orderkey")).as("cnt"),
        coalesce(sum(m3(col("o_totalprice"))), lit(0).cast("decimal(14,3)")).as("rev"))
      .withColumn("customer_segment",
        when(col("cnt") <= 1, "New")
          .when(col("cnt") <= 3, "Occasional")
          .when(col("cnt") <= 5, "Regular")
          .otherwise("Loyal"))
      .withColumn("balance_band",
        when(col("c_acctbal") < 0, "Debt")
          .when(col("c_acctbal") < 2500, "Low")
          .when(col("c_acctbal") < 5000, "Mid")
          .when(col("c_acctbal") < 7500, "High")
          .otherwise("Premium"))
    perCust.groupBy(col("customer_segment"), col("balance_band"))
      .agg(
        count(lit(1)).as("customer_count"),
        out2(sum(col("rev"))).as("total_revenue"),
        (out2(sum(col("rev"))) / nz(sum(col("cnt")).cast("double"))).as("avg_order_value"),
        sum(col("cnt")).as("total_orders"),
        (sum(col("cnt")).cast("double") / count(lit(1))).as("avg_orders_per_customer"))
  }

  // ─── q04 segment × priority (gender analog, sql:65-75) ───────────────
  def segmentCategoryAnalysis(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"), col("o_orderpriority").as("priority"))
      .agg(
        sum(m3(col("o_totalprice"))).as("rev_dec"),
        countDistinct(col("o_orderkey")).as("total_transactions"),
        count(lit(1)).as("n"),
        sum(m2(col("c_acctbal"))).as("bal_dec"))
      .select(
        col("segment"), col("priority"),
        out2(col("rev_dec")).as("total_revenue"),
        col("total_transactions"),
        (out2(col("rev_dec")) / col("n")).as("avg_order_value"),
        (out2(col("bal_dec")) / col("n")).as("avg_acctbal"))
  }

  // ─── q05 weekend vs weekday (sql:78-88) ──────────────────────────────
  def weekendWeekday(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.groupBy(
        when(iso_dow(col("o_orderdate")) >= 6, "Weekend").otherwise("Weekday").as("day_type"),
        date_format(col("o_orderdate"), "EEEE").as("day_name"),
        iso_dow(col("o_orderdate")).cast("long").as("day_of_week"))
      .agg(
        sum(m3(col("o_totalprice"))).as("rev_dec"),
        countDistinct(col("o_orderkey")).as("total_transactions"))
      .select(
        col("day_type"), col("day_name"), col("day_of_week"),
        out2(col("rev_dec")).as("total_revenue"),
        col("total_transactions"),
        (out2(col("rev_dec")) / col("total_transactions")).as("avg_order_value"))
  }

  // ─── q06 top customers (sql:91-108) ──────────────────────────────────
  def topCustomers(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    // rank on the exact-decimal-rounded revenue + key tiebreak → deterministic
    o.groupBy(col("o_custkey"))
      .agg(
        out2(sum(m3(col("o_totalprice")))).as("total_revenue"),
        count(col("o_orderkey")).as("total_orders"))
      .withColumn("avg_order_value", col("total_revenue") / col("total_orders"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .select(
        col("c_custkey").as("customer_id"),
        col("c_name").as("customer_name"),
        col("c_mktsegment").as("segment"),
        col("c_acctbal").as("acctbal"),
        col("total_orders"), col("total_revenue"), col("avg_order_value"))
      .orderBy(col("total_revenue").desc, col("customer_id"))
      .limit(20) // planned as TakeOrderedAndProject — no global sort
  }

  // ─── q07 product catalog overview (sql:111-123) ──────────────────────
  def productCatalog(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    p.groupBy(col("p_type").as("product_category"))
      .agg(
        count(lit(1)).as("product_count"),
        sum(m2(col("p_retailprice"))).as("price_dec"),
        round(min(col("p_retailprice")), 2).as("min_price"),
        round(max(col("p_retailprice")), 2).as("max_price"),
        sum(col("p_size")).as("size_sum"),
        countDistinct(col("p_brand")).as("brand_count"))
      .select(
        col("product_category"), col("product_count"),
        (out2(col("price_dec")) / col("product_count")).as("avg_price"),
        col("min_price"), col("max_price"),
        (col("size_sum").cast("double") / col("product_count")).as("avg_size"),
        col("brand_count"))
  }

  // ─── q08 quarterly trend w/ YoY LAG(4) (sql:126-142) ─────────────────
  def quarterlyYoy(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val q = o.groupBy(
        year(col("o_orderdate")).cast("long").as("year"),
        quarter(col("o_orderdate")).cast("long").as("quarter"))
      .agg(
        out2(sum(m3(col("o_totalprice")))).as("quarterly_revenue"),
        countDistinct(col("o_orderkey")).as("quarterly_transactions"),
        countDistinct(col("o_custkey")).as("quarterly_customers"))
    val w = Window.orderBy(col("year"), col("quarter"))
    q.withColumn("same_quarter_prev_year", lag(col("quarterly_revenue"), 4).over(w))
      .select(
        col("year"), col("quarter"),
        col("quarterly_revenue"),
        col("quarterly_transactions"), col("quarterly_customers"),
        col("same_quarter_prev_year"),
        ((col("quarterly_revenue") - col("same_quarter_prev_year"))
          / nz(col("same_quarter_prev_year")) * 100).as("yoy_growth_pct"))
  }

  // ─── q16 day × month heatmap pivot (streamlit_app.py:907-918) ────────
  def dayMonthHeatmap(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.groupBy(
        date_format(col("o_orderdate"), "EEEE").as("day_name"),
        iso_dow(col("o_orderdate")).cast("long").as("day_of_week"),
        month(col("o_orderdate")).cast("long").as("month"))
      .agg(
        out2(sum(m3(col("o_totalprice")))).as("total_revenue"),
        count(lit(1)).as("n_orders"))
  }

  // ─── q17 brand revenue rank / share / cumulative windows ─────────────
  def revenueRankWindow(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir).select(col("p_partkey"), col("p_brand"))
    val m = li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"))
      .agg(sum(net(col("l_extendedprice"), col("l_discount"))).as("rev_dec"))
      .withColumn("rev_r", out2(col("rev_dec")))
    val byRev = Window.orderBy(col("rev_r").desc, col("brand"))
    val all = Window.partitionBy()
    m.select(
      col("brand"),
      col("rev_r").as("total_revenue"),
      row_number().over(byRev).cast("long").as("revenue_rank"),
      round(outRaw(col("rev_dec")) / sum(outRaw(col("rev_dec"))).over(all) * 100, 2)
        .as("revenue_share_pct"),
      round(sum(col("rev_r")).over(byRev.rowsBetween(Window.unboundedPreceding, 0)), 2)
        .as("cumulative_revenue"))
  }

  // ─── q18 priority × status matrix (dag validation analog) ────────────
  def priorityStatusMatrix(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val m = o.groupBy(col("o_orderpriority").as("priority"), col("o_orderstatus").as("status"))
      .agg(
        count(lit(1)).as("n_orders"),
        out2(sum(m3(col("o_totalprice")))).as("total_revenue"))
    val wp = Window.partitionBy(col("priority"))
    // raw integer-ratio percentage: exact in both engines, no rounding
    m.withColumn("pct_of_priority",
      col("n_orders").cast("double") * 100 / sum(col("n_orders")).over(wp).cast("double"))
  }

  // ─── q20 pricing summary: full-scan aggregation baseline ─────────────
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("2000-01-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"), // integer-valued: exact in double
        sum(m2(col("l_extendedprice"))).as("ep_dec"),
        sum(net(col("l_extendedprice"), col("l_discount"))).as("disc_dec"),
        sum(charge(col("l_extendedprice"), col("l_discount"), col("l_tax"))).as("charge_dec"),
        sum(r2(col("l_discount"))).as("d_dec"),
        count(lit(1)).as("count_order"))
      .select(
        col("l_returnflag"), col("l_linestatus"),
        col("sum_qty"),
        out2(col("ep_dec")).as("sum_base_price"),
        out2(col("disc_dec")).as("sum_disc_price"),
        out2(col("charge_dec")).as("sum_charge"),
        (col("sum_qty") / col("count_order")).as("avg_qty"),
        (out2(col("ep_dec")) / col("count_order")).as("avg_price"),
        (out2(col("d_dec")) / col("count_order")).as("avg_disc"),
        col("count_order"))
  }

  // ─── q21 region/nation revenue rollup: broadcast join chain ──────────
  // ─── q58 segment × priority CUBE (all four grains, one pass) ─────────
  /** The dashboard-subtotal variant of q04: the same segment × priority
    * measures at ALL FOUR grains — leaf, per-segment subtotal,
    * per-priority subtotal, grand total — in ONE pass (the reference's
    * pivot panels render exactly these margins, streamlit_app.py's
    * segment/priority breakdowns). q25's rollup covers the hierarchical
    * ladder (region→nation→total); CUBE emits the non-hierarchical
    * cross grains a rollup cannot.
    *
    * Scale: one cube = one Expand (each fact row replicated 4×, one per
    * grouping set) feeding ONE map-side-combining aggregation — vs four
    * separate groupBys, which would scan and shuffle the fact four
    * times. The 4× pre-shuffle inflation collapses to the grain
    * cardinalities at the combiner, so the exchange carries ~|segments|
    * × |priorities| × 4 rows. grouping() flags disambiguate real NULL
    * keys from subtotal rows (none here, but the contract matters).
    */
  def segmentPriorityCube(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_mktsegment"))
    o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .cube(col("c_mktsegment"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(m3(col("o_totalprice"))).as("rev_dec"),
        grouping(col("c_mktsegment")).cast("long").as("gr_segment"),
        grouping(col("o_orderpriority")).cast("long").as("gr_priority"))
      .select(col("c_mktsegment").as("segment"),
        col("o_orderpriority").as("priority"),
        col("n_orders"), out2(col("rev_dec")).as("total_revenue"),
        col("gr_segment"), col("gr_priority"))
  }

  def regionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
    val n = Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val r = Tables.region(spark, dir)
    o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
      .agg(
        out2(sum(m3(col("o_totalprice")))).as("total_revenue"),
        countDistinct(col("o_custkey")).as("n_customers"),
        countDistinct(col("o_orderkey")).as("n_orders"))
  }

  // ─── q54 supplier scorecard ──────────────────────────────────────────
  /** Supply-side rollup — the vendor counterpart of q21's customer
    * geography: per supplier, nation/region, shipped lines, net
    * revenue, return rate (share of 'R' returnflag lines), and the
    * supplier's revenue rank within its nation (procurement's
    * "who do we actually depend on, and where" table). Completes fact
    * coverage of the supplier dimension.
    *
    * Scale: one map-side-combining groupBy(l_suppkey) collapses the
    * fact (integer + DECIMAL sums only); supplier/nation/region dims
    * broadcast into the POST-AGG frame (supplier-sized, ~0.01% of the
    * fact). The rank window partitions that small frame by nation —
    * ~25 partitions is fine for a dim-sized frame, never for a fact
    * (the q17 rule). Return rate divides two exact longs once.
    */
  def supplierScorecard(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"),
        col("l_returnflag"))
    val s = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"), col("s_acctbal"))
    val n = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val r = Tables.region(spark, dir)
    val perSupp = li.groupBy(col("l_suppkey"))
      .agg(
        count(lit(1)).as("n_lines"),
        out2(sum(net(col("l_extendedprice"), col("l_discount")))).as("net_revenue"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("n_returned"))
    perSupp
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("l_suppkey").as("supplier_key"), col("s_name").as("supplier_name"),
        col("n_name").as("nation"), col("r_name").as("region"),
        col("s_acctbal"), col("n_lines"), col("net_revenue"),
        (col("n_returned").cast("double") / col("n_lines")).as("return_rate"))
      .withColumn("nation_rank", row_number().over(
        Window.partitionBy(col("nation"))
          .orderBy(col("net_revenue").desc, col("supplier_key"))).cast("long"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_monthly_sales_trend" -> monthlySalesTrend,
    "q54_supplier_scorecard" -> supplierScorecard,
    "q02_category_performance" -> categoryPerformance,
    "q03_customer_segmentation" -> customerSegmentation,
    "q04_segment_category_analysis" -> segmentCategoryAnalysis,
    "q05_weekend_weekday" -> weekendWeekday,
    "q06_top_customers" -> topCustomers,
    "q07_product_catalog" -> productCatalog,
    "q08_quarterly_yoy" -> quarterlyYoy,
    "q16_day_month_heatmap" -> dayMonthHeatmap,
    "q17_revenue_rank_window" -> revenueRankWindow,
    "q18_priority_status_matrix" -> priorityStatusMatrix,
    "q20_pricing_summary" -> pricingSummary,
    "q21_region_revenue" -> regionRevenue,
    "q58_segment_priority_cube" -> segmentPriorityCube,
    "q64_discount_effectiveness" -> discountEffectiveness,
    "q65_seasonal_index" -> seasonalIndex,
    "q66_churn_status" -> churnStatus)

  // ─── q65 seasonal index per category ──────────────────────────────────
  /** Month-of-year seasonality per category: each (category, month)
    * cell's average monthly revenue as a permille index against the
    * category's overall monthly average (1000 = no seasonality) — the
    * classic retail planning table (when to stock what) that q01's
    * monthly trend and q43's linear trendline both average past:
    * a trend says WHERE revenue is going, the seasonal index says WHEN
    * within the year it arrives.
    *
    * Determinism: monthly revenue is the Money DECIMAL chain moved to
    * BIGINT at the chain's NATIVE 10⁻⁴-dollar scale — ×10000 makes the
    * decimal exactly integral, so the cast carries no fractional part
    * for the engines to round differently (Spark truncates a decimal
    * cast, DuckDB rounds it — ×100 "cents" would diverge on scale-4
    * values). The index is then pure integer arithmetic — avg units
    * per month on each side first (each div loses < 10⁻⁴ dollars,
    * deterministic), then one permille div, keeping every intermediate
    * under 2⁶³ at warehouse revenue scales (the single-expression
    * cross-product form would overflow).
    *
    * Scale: ONE fact groupBy onto (category × month) keys after a
    * broadcast part join; the month-of-year census and per-category
    * totals are aggregations over the bounded (6 × ~84) monthly frame;
    * the join-back is category-keyed and bounded. No windows.
    */
  def seasonalIndex(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir).select(col("p_partkey"), col("p_type").as("category"))
    val monthly = li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("category"),
        (year(col("l_shipdate")) * 100 + month(col("l_shipdate"))).cast("long").as("ym"))
      .agg(sum(net(col("l_extendedprice"), col("l_discount"))).as("rev_dec"))
      .select(col("category"), col("ym"),
        (col("rev_dec") * 10000).cast("long").as("rev_fp"))
    val moy = monthly.groupBy(col("category"), expr("ym % 100").as("month_of_year"))
      .agg(count(lit(1)).as("n_months"), sum(col("rev_fp")).as("rc"))
    val tot = monthly.groupBy(col("category"))
      .agg(count(lit(1)).as("ct"), sum(col("rev_fp")).as("rt"))
    moy.join(tot, Seq("category"))
      .select(col("category"), col("month_of_year"), col("n_months"),
        (col("rc").cast("double") / 10000.0).as("revenue"),
        expr("(1000 * (rc div n_months)) div (rt div ct)").as("seasonal_index_permille"))
  }

  // ─── q66 churn status per segment ─────────────────────────────────────
  /** Customer lifecycle census at the corpus snapshot date (max order
    * date): per market segment, how many customers are active (last
    * order ≤ 90 days before the snapshot), lapsed (≤ 365) or churned
    * (older), with per-segment permille shares — the CRM view q52's RFM
    * scores feed; this is its thresholded lifecycle summary.
    *
    * Scale: last order per customer is ONE map-side-combining
    * groupBy(o_custkey) max; the snapshot date is a 1-row broadcast
    * crossJoin (q39 rule); segment attaches via a broadcast dim join;
    * the status census is a bounded (5 × 3) aggregation, and the
    * per-segment share join-back is bounded by segments.
    */
  def churnStatus(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment").as("segment"))
    val last = o.groupBy(col("o_custkey")).agg(max(col("o_orderdate")).as("last_order"))
    val snap = o.agg(max(col("o_orderdate")).as("snapshot_date"))
    val status = last.crossJoin(broadcast(snap))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .select(col("segment"),
        when(datediff(col("snapshot_date"), col("last_order")) <= 90, lit("active"))
          .when(datediff(col("snapshot_date"), col("last_order")) <= 365, lit("lapsed"))
          .otherwise(lit("churned")).as("status"))
      .groupBy(col("segment"), col("status"))
      .agg(count(lit(1)).as("n_customers"))
    val seg = status.groupBy(col("segment")).agg(sum(col("n_customers")).as("seg_total"))
    status.join(seg, Seq("segment"))
      .select(col("segment"), col("status"), col("n_customers"),
        expr("(1000 * n_customers) div seg_total").as("share_permille"))
  }

  // ─── q64 discount effectiveness ───────────────────────────────────────
  /** Does a discount actually move volume? Per discount band (integer
    * percent — the catalog's native 1%-step grain): line/quantity
    * volume, DECIMAL-exact gross vs net revenue (the band's discount
    * cost is their difference), quantity share, and the
    * lift-vs-no-discount ratio of per-line quantity against the 0%
    * band — the pricing question the reference's pricing summary (q20)
    * aggregates past. All ratios integer permille (the house fixed-
    * point discipline); money rides the [[graft.functions.Money]]
    * decimal chain.
    *
    * Scale: ONE map-side-combining groupBy over the fact onto ≤ 11
    * band keys; the totals and the 0%-baseline are 1-row broadcast
    * crossJoins into the band-bounded frame (the q39 rule).
    */
  def discountEffectiveness(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val base = li
      .groupBy((r2(col("l_discount")) * 100).cast("int").as("discount_pct"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(col("l_quantity")).cast("long").as("sum_qty"),
        sum(m2(col("l_extendedprice"))).as("g_dec"),
        sum(net(col("l_extendedprice"), col("l_discount"))).as("n_dec"))
      .select(col("discount_pct"), col("n_lines"), col("sum_qty"),
        out2(col("g_dec")).as("gross_revenue"),
        out2(col("n_dec")).as("net_revenue"),
        out2(col("g_dec") - col("n_dec")).as("discount_cost"),
        expr("(1000 * sum_qty) div n_lines").as("qty_per_line_fp"))
    // The 0% baseline rides the SAME 1-row aggregate as the total (a
    // conditional max over the band frame), so a corpus with no 0% band
    // degrades to a NULL lift column instead of an empty result — the
    // filter→crossJoin shape would silently drop every band row.
    val tot = base.agg(
      sum(col("sum_qty")).as("qty_total"),
      max(when(col("discount_pct") === 0, col("qty_per_line_fp"))).as("qty0_fp"))
    base.crossJoin(broadcast(tot))
      .select(col("discount_pct"), col("n_lines"), col("sum_qty"),
        col("gross_revenue"), col("net_revenue"), col("discount_cost"),
        col("qty_per_line_fp"),
        expr("(1000 * sum_qty) div qty_total").as("qty_share_permille"),
        expr("(1000 * qty_per_line_fp) div qty0_fp").as("lift_vs_no_discount_permille"))
  }

  // oracle building blocks (DuckDB dialect, mirroring functions.Money)
  private val TP = "sum(CAST(o_totalprice AS DECIMAL(14,3)))"
  private val NET =
    "sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))"
  private val EP = "sum(CAST(l_extendedprice AS DECIMAL(12,2)))"
  private def o2(x: String) = s"CAST(round($x, 2) AS DOUBLE)"
  private def oraw(x: String) = s"CAST($x AS DOUBLE)"

  val oracle: Map[String, String] = Map(
    "q54_supplier_scorecard" ->
      s"""WITH ps AS (
        |  SELECT l_suppkey,
        |         CAST(count(*) AS BIGINT) AS n_lines,
        |         ${o2(NET)} AS net_revenue,
        |         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned
        |  FROM lineitem GROUP BY 1)
        |SELECT l_suppkey AS supplier_key, s_name AS supplier_name,
        |       n_name AS nation, r_name AS region,
        |       s_acctbal, n_lines, net_revenue,
        |       CAST(n_returned AS DOUBLE) / n_lines AS return_rate,
        |       CAST(row_number() OVER (PARTITION BY n_name
        |              ORDER BY net_revenue DESC, l_suppkey) AS BIGINT) AS nation_rank
        |FROM ps
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey""".stripMargin,
    "q01_monthly_sales_trend" ->
      s"""WITH m AS (
        |  SELECT year(o_orderdate) AS year, month(o_orderdate) AS month,
        |         monthname(o_orderdate) AS month_name,
        |         ${o2(TP)} AS total_revenue,
        |         count(DISTINCT o_orderkey) AS total_transactions,
        |         count(DISTINCT o_custkey) AS unique_customers
        |  FROM orders GROUP BY 1, 2, 3),
        |w AS (
        |  SELECT *, lag(total_revenue) OVER (ORDER BY year, month) AS prev_month_revenue FROM m)
        |SELECT year, month, month_name, total_revenue,
        |       total_transactions, unique_customers,
        |       total_revenue / total_transactions AS avg_order_value,
        |       prev_month_revenue,
        |       (total_revenue - prev_month_revenue) / nullif(prev_month_revenue, 0) * 100 AS mom_growth_pct
        |FROM w""".stripMargin,
    "q02_category_performance" ->
      s"""WITH m AS (
        |  SELECT p_type AS product_category,
        |         $NET AS rev_dec,
        |         count(DISTINCT l_orderkey) AS total_transactions,
        |         sum(l_quantity) AS total_quantity,
        |         $EP AS ep_dec,
        |         count(*) AS n_lines,
        |         count(DISTINCT o_custkey) AS unique_customers,
        |         count(DISTINCT l_partkey) AS unique_parts
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1),
        |cd AS (
        |  SELECT DISTINCT p_type AS product_category,
        |         CASE WHEN p_type IN ('STANDARD', 'ECONOMY') THEN 'Value'
        |              WHEN p_type IN ('SMALL', 'MEDIUM', 'LARGE') THEN 'General'
        |              WHEN p_type = 'PROMO' THEN 'Promotional'
        |              ELSE 'Unknown' END AS category_group
        |  FROM part)
        |SELECT m.product_category, ${o2("rev_dec")} AS total_revenue,
        |       round(${oraw("rev_dec")} / sum(${oraw("rev_dec")}) OVER () * 100, 2) AS revenue_share_pct,
        |       total_transactions, total_quantity,
        |       ${o2("ep_dec")} / n_lines AS avg_unit_price,
        |       unique_customers, unique_parts, cd.category_group
        |FROM m LEFT JOIN cd USING (product_category)""".stripMargin,
    "q03_customer_segmentation" ->
      s"""WITH pc AS (
        |  SELECT c_custkey, c_mktsegment, c_acctbal,
        |         count(o_orderkey) AS cnt,
        |         coalesce($TP, CAST(0 AS DECIMAL(14,3))) AS rev
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY 1, 2, 3),
        |seg AS (
        |  SELECT *,
        |    CASE WHEN cnt <= 1 THEN 'New' WHEN cnt <= 3 THEN 'Occasional'
        |         WHEN cnt <= 5 THEN 'Regular' ELSE 'Loyal' END AS customer_segment,
        |    CASE WHEN c_acctbal < 0 THEN 'Debt' WHEN c_acctbal < 2500 THEN 'Low'
        |         WHEN c_acctbal < 5000 THEN 'Mid' WHEN c_acctbal < 7500 THEN 'High'
        |         ELSE 'Premium' END AS balance_band
        |  FROM pc)
        |SELECT customer_segment, balance_band,
        |       count(*) AS customer_count,
        |       ${o2("sum(rev)")} AS total_revenue,
        |       ${o2("sum(rev)")} / nullif(CAST(sum(cnt) AS DOUBLE), 0) AS avg_order_value,
        |       CAST(sum(cnt) AS BIGINT) AS total_orders,
        |       CAST(sum(cnt) AS DOUBLE) / count(*) AS avg_orders_per_customer
        |FROM seg GROUP BY 1, 2""".stripMargin,
    "q04_segment_category_analysis" ->
      s"""WITH m AS (
        |  SELECT c_mktsegment AS segment, o_orderpriority AS priority,
        |         $TP AS rev_dec,
        |         count(DISTINCT o_orderkey) AS total_transactions,
        |         count(*) AS n,
        |         sum(CAST(c_acctbal AS DECIMAL(12,2))) AS bal_dec
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2)
        |SELECT segment, priority,
        |       ${o2("rev_dec")} AS total_revenue,
        |       total_transactions,
        |       ${o2("rev_dec")} / n AS avg_order_value,
        |       ${o2("bal_dec")} / n AS avg_acctbal
        |FROM m""".stripMargin,
    "q58_segment_priority_cube" ->
      s"""SELECT c_mktsegment AS segment, o_orderpriority AS priority,
        |       count(*) AS n_orders,
        |       ${o2(TP)} AS total_revenue,
        |       CAST(grouping(c_mktsegment) AS BIGINT) AS gr_segment,
        |       CAST(grouping(o_orderpriority) AS BIGINT) AS gr_priority
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY CUBE (c_mktsegment, o_orderpriority)""".stripMargin,
    "q05_weekend_weekday" ->
      s"""WITH m AS (
        |  SELECT CASE WHEN isodow(o_orderdate) >= 6 THEN 'Weekend' ELSE 'Weekday' END AS day_type,
        |         dayname(o_orderdate) AS day_name,
        |         CAST(isodow(o_orderdate) AS BIGINT) AS day_of_week,
        |         $TP AS rev_dec,
        |         count(DISTINCT o_orderkey) AS total_transactions
        |  FROM orders GROUP BY 1, 2, 3)
        |SELECT day_type, day_name, day_of_week,
        |       ${o2("rev_dec")} AS total_revenue,
        |       total_transactions,
        |       ${o2("rev_dec")} / total_transactions AS avg_order_value
        |FROM m""".stripMargin,
    "q06_top_customers" ->
      s"""WITH agg AS (
        |  SELECT o_custkey,
        |         ${o2(TP)} AS total_revenue,
        |         count(o_orderkey) AS total_orders
        |  FROM orders GROUP BY 1)
        |SELECT c_custkey AS customer_id, c_name AS customer_name,
        |       c_mktsegment AS segment, c_acctbal AS acctbal,
        |       total_orders, total_revenue,
        |       total_revenue / total_orders AS avg_order_value
        |FROM agg JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_revenue DESC, customer_id
        |LIMIT 20""".stripMargin,
    "q07_product_catalog" ->
      s"""WITH m AS (
        |  SELECT p_type AS product_category,
        |         count(*) AS product_count,
        |         sum(CAST(p_retailprice AS DECIMAL(12,2))) AS price_dec,
        |         round(min(p_retailprice), 2) AS min_price,
        |         round(max(p_retailprice), 2) AS max_price,
        |         CAST(sum(p_size) AS BIGINT) AS size_sum,
        |         count(DISTINCT p_brand) AS brand_count
        |  FROM part GROUP BY 1)
        |SELECT product_category, product_count,
        |       ${o2("price_dec")} / product_count AS avg_price,
        |       min_price, max_price,
        |       CAST(size_sum AS DOUBLE) / product_count AS avg_size,
        |       brand_count
        |FROM m""".stripMargin,
    "q08_quarterly_yoy" ->
      s"""WITH q AS (
        |  SELECT year(o_orderdate) AS year, quarter(o_orderdate) AS quarter,
        |         ${o2(TP)} AS quarterly_revenue,
        |         count(DISTINCT o_orderkey) AS quarterly_transactions,
        |         count(DISTINCT o_custkey) AS quarterly_customers
        |  FROM orders GROUP BY 1, 2),
        |w AS (
        |  SELECT *, lag(quarterly_revenue, 4) OVER (ORDER BY year, quarter) AS same_quarter_prev_year FROM q)
        |SELECT year, quarter, quarterly_revenue,
        |       quarterly_transactions, quarterly_customers,
        |       same_quarter_prev_year,
        |       (quarterly_revenue - same_quarter_prev_year)
        |         / nullif(same_quarter_prev_year, 0) * 100 AS yoy_growth_pct
        |FROM w""".stripMargin,
    "q16_day_month_heatmap" ->
      s"""SELECT dayname(o_orderdate) AS day_name,
        |       CAST(isodow(o_orderdate) AS BIGINT) AS day_of_week,
        |       CAST(month(o_orderdate) AS BIGINT) AS month,
        |       ${o2(TP)} AS total_revenue,
        |       count(*) AS n_orders
        |FROM orders GROUP BY 1, 2, 3""".stripMargin,
    "q17_revenue_rank_window" ->
      s"""WITH m AS (
        |  SELECT p_brand AS brand,
        |         $NET AS rev_dec,
        |         ${o2(NET)} AS rev_r
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1)
        |SELECT brand, rev_r AS total_revenue,
        |       CAST(row_number() OVER (ORDER BY rev_r DESC, brand) AS BIGINT) AS revenue_rank,
        |       round(${oraw("rev_dec")} / sum(${oraw("rev_dec")}) OVER () * 100, 2) AS revenue_share_pct,
        |       round(sum(rev_r) OVER (ORDER BY rev_r DESC, brand
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cumulative_revenue
        |FROM m""".stripMargin,
    "q18_priority_status_matrix" ->
      s"""WITH m AS (
        |  SELECT o_orderpriority AS priority, o_orderstatus AS status,
        |         count(*) AS n_orders,
        |         ${o2(TP)} AS total_revenue
        |  FROM orders GROUP BY 1, 2)
        |SELECT priority, status, n_orders, total_revenue,
        |       CAST(n_orders AS DOUBLE) * 100
        |         / CAST(sum(n_orders) OVER (PARTITION BY priority) AS DOUBLE) AS pct_of_priority
        |FROM m""".stripMargin,
    "q20_pricing_summary" ->
      s"""WITH m AS (
        |  SELECT l_returnflag, l_linestatus,
        |         sum(l_quantity) AS sum_qty,
        |         $EP AS ep_dec,
        |         $NET AS disc_dec,
        |         sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |             * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
        |             * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS charge_dec,
        |         sum(CAST(l_discount AS DECIMAL(3,2))) AS d_dec,
        |         count(*) AS count_order
        |  FROM lineitem
        |  WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
        |  GROUP BY 1, 2)
        |SELECT l_returnflag, l_linestatus, sum_qty,
        |       ${o2("ep_dec")} AS sum_base_price,
        |       ${o2("disc_dec")} AS sum_disc_price,
        |       ${o2("charge_dec")} AS sum_charge,
        |       sum_qty / count_order AS avg_qty,
        |       ${o2("ep_dec")} / count_order AS avg_price,
        |       ${o2("d_dec")} / count_order AS avg_disc,
        |       count_order
        |FROM m""".stripMargin,
    "q65_seasonal_index" ->
      s"""WITH monthly AS (
        |  SELECT p.p_type AS category,
        |         year(l.l_shipdate) * 100 + month(l.l_shipdate) AS ym,
        |         CAST($NET * 10000 AS BIGINT) AS rev_fp
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1, 2),
        |moy AS (
        |  SELECT category, ym % 100 AS month_of_year,
        |         CAST(count(*) AS BIGINT) AS n_months,
        |         CAST(sum(rev_fp) AS BIGINT) AS rc
        |  FROM monthly GROUP BY 1, 2),
        |tot AS (
        |  SELECT category, CAST(count(*) AS BIGINT) AS ct,
        |         CAST(sum(rev_fp) AS BIGINT) AS rt
        |  FROM monthly GROUP BY 1)
        |SELECT m.category, m.month_of_year, m.n_months,
        |       CAST(m.rc AS DOUBLE) / 10000.0 AS revenue,
        |       (1000 * (m.rc // m.n_months)) // (t.rt // t.ct) AS seasonal_index_permille
        |FROM moy m JOIN tot t USING (category)""".stripMargin,
    "q66_churn_status" ->
      """WITH last AS (
        |  SELECT o_custkey, max(o_orderdate) AS last_order FROM orders GROUP BY 1),
        |snap AS (SELECT max(o_orderdate) AS snapshot_date FROM orders),
        |st AS (
        |  SELECT c.c_mktsegment AS segment,
        |         CASE WHEN date_diff('day', CAST(l.last_order AS DATE),
        |                              CAST(s.snapshot_date AS DATE)) <= 90 THEN 'active'
        |              WHEN date_diff('day', CAST(l.last_order AS DATE),
        |                              CAST(s.snapshot_date AS DATE)) <= 365 THEN 'lapsed'
        |              ELSE 'churned' END AS status
        |  FROM last l CROSS JOIN snap s
        |  JOIN customer c ON c.c_custkey = l.o_custkey),
        |cnt AS (
        |  SELECT segment, status, CAST(count(*) AS BIGINT) AS n_customers
        |  FROM st GROUP BY 1, 2),
        |seg AS (
        |  SELECT segment, CAST(sum(n_customers) AS BIGINT) AS seg_total
        |  FROM cnt GROUP BY 1)
        |SELECT c.segment, c.status, c.n_customers,
        |       (1000 * c.n_customers) // s.seg_total AS share_permille
        |FROM cnt c JOIN seg s USING (segment)""".stripMargin,
    "q64_discount_effectiveness" ->
      s"""WITH b AS (
        |  SELECT CAST(CAST(l_discount AS DECIMAL(3,2)) * 100 AS INTEGER) AS discount_pct,
        |         CAST(count(*) AS BIGINT) AS n_lines,
        |         CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |         $EP AS g_dec,
        |         $NET AS n_dec
        |  FROM lineitem GROUP BY 1),
        |f AS (
        |  SELECT discount_pct, n_lines, sum_qty,
        |         ${o2("g_dec")} AS gross_revenue,
        |         ${o2("n_dec")} AS net_revenue,
        |         ${o2("g_dec - n_dec")} AS discount_cost,
        |         (1000 * sum_qty) // n_lines AS qty_per_line_fp
        |  FROM b),
        |tot AS (
        |  SELECT CAST(sum(sum_qty) AS BIGINT) AS qty_total,
        |         max(CASE WHEN discount_pct = 0 THEN qty_per_line_fp END) AS qty0_fp
        |  FROM f)
        |SELECT f.discount_pct, f.n_lines, f.sum_qty, f.gross_revenue,
        |       f.net_revenue, f.discount_cost, f.qty_per_line_fp,
        |       (1000 * f.sum_qty) // t.qty_total AS qty_share_permille,
        |       (1000 * f.qty_per_line_fp) // t.qty0_fp AS lift_vs_no_discount_permille
        |FROM f, tot t""".stripMargin,
    "q21_region_revenue" ->
      s"""SELECT r_name AS region, n_name AS nation,
        |       ${o2(TP)} AS total_revenue,
        |       count(DISTINCT o_custkey) AS n_customers,
        |       count(DISTINCT o_orderkey) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2""".stripMargin)
}
