package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Graph analytics over the co-purchase graph — parts are nodes, an
  * edge connects two parts that appear in the same order (the classic
  * "customers who bought X also bought Y" structure the reference's
  * basket views (q53 basket affinity) rank pairwise; PageRank ranks
  * parts by GLOBAL graph centrality instead, surfacing hub products a
  * pairwise lift score misses).
  *
  * Determinism contract: ranks are INTEGER fixed-point (parts-per-10¹²
  * of total mass) and every per-iteration operation is integer
  * arithmetic — contribution = rank div degree, damping = (85·Σ) div
  * 100 — so the incoming-mass sum is a BIGINT sum, associative and
  * order-independent, and Spark's nondeterministic aggregation order
  * produces bit-identical ranks to DuckDB's. (Float PageRank would
  * diverge between engines in the last ulps and amplify over
  * iterations.) Integer floors leak ~1 unit of mass per node per
  * iteration — a deliberate trade: this is the standard power
  * iteration up to 10⁻¹² absolute error, with exact cross-engine
  * reproducibility.
  */
object Graph {

  /** Fixed-point scale: ranks are parts-per-SCALE of total mass. */
  private val Scale = 1000000000000L
  /** Power-iteration rounds. 6 rounds on a damping-0.85 walk bounds
    * the unconverged tail by 0.85⁶ ≈ 0.38 of the initial residual —
    * enough to stabilize the ranking order on a dense co-purchase
    * graph (diameter ~3-4) while keeping the oracle's unrolled CTE
    * chain readable. The iteration count is part of the operator's
    * semantics (both engines unroll the same 6 rounds).
    */
  private val Iters = 6

  /** q59: fixed-point PageRank over the part co-purchase graph.
    *
    * Scale: the edge list is built per order — the per-order self-join
    * fans out at most (items/order)² rows per order (TPC-H shape: ≤ 7
    * lineitems, ≤ 49 ordered pairs), so edge generation is linear in
    * lineitem with a small constant, never corpus-pairwise. Each of
    * the 6 iterations is one equi-join (edges ⋈ ranks on src) plus one
    * hash aggregation (sum by dst) — the Pregel message-passing shape;
    * the ranks frame is node-sized (≪ edges), broadcastable until the
    * catalog is huge, after which AQE picks the shuffled-hash form and
    * the iteration cost is two exchanges over the edge list. The
    * 1-row node-count/teleport frames ride broadcast crossJoins (the
    * Pipeline bounded-frame rule).
    */
  def copurchasePagerank(spark: SparkSession, dir: String): DataFrame =
    copurchasePagerankOf(Tables.lineitem(spark, dir))

  private[graft] def copurchasePagerankOf(lineitem: DataFrame): DataFrame = {
    val li = lineitem.select(col("l_orderkey"), col("l_partkey")).distinct()
    val ed = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") =!= col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      .distinct()
    val deg = ed.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // 1-row frames: node count and the shared teleport term
    val nF = deg.agg(count(lit(1)).as("n"))
    val teleF = nF.select(col("n"),
      expr(s"(15 * ($Scale div n)) div 100").as("tele"),
      expr(s"$Scale div n").as("r_init"))
    var ranks = deg.crossJoin(broadcast(teleF))
      .select(col("src").as("node"), col("deg"), col("r_init").as("r"))
    for (_ <- 1 to Iters) {
      val s = ed
        .join(ranks.select(col("node").as("src"), expr("r div deg").as("contrib")),
          Seq("src"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("s"))
      ranks = deg.join(s.select(col("dst").as("src"), col("s")), Seq("src"), "left")
        .crossJoin(broadcast(teleF))
        .select(col("src").as("node"), col("deg"),
          expr("tele + (85 * coalesce(s, 0)) div 100").as("r"))
    }
    ranks.select(
      col("node").as("part_key"), col("deg").as("degree"),
      col("r").as("rank_fp"),
      // constant-divisor double division — identical IEEE op both engines
      (col("r").cast("double") / lit(Scale.toDouble)).as("rank"))
  }

  /** Oracle twin — the identical 6-round unrolled fixed-point walk;
    * iteration CTEs are generated from the same [[Scale]]/[[Iters]]
    * constants so the engines can never disagree on the geometry.
    */
  private def pagerankSql: String = {
    val iters = (1 to Iters).map { k =>
      val prev = if (k == 1) "r0" else s"it${k - 1}r"
      s"""it$k AS (
         |  SELECT e.dst AS node, CAST(sum(p.r // p.deg) AS BIGINT) AS s
         |  FROM ed e JOIN $prev p ON e.src = p.node GROUP BY 1),
         |it${k}r AS (
         |  SELECT d.src AS node, d.deg, t.tele + (85 * COALESCE(s.s, 0)) // 100 AS r
         |  FROM deg d LEFT JOIN it$k s ON d.src = s.node, tele t)""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |ed AS (
       |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
       |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
       |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM ed GROUP BY 1),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
       |tele AS (SELECT n, (15 * ($Scale // n)) // 100 AS tele, $Scale // n AS r_init FROM nn),
       |r0 AS (SELECT d.src AS node, d.deg, t.r_init AS r FROM deg d, tele t),
       |$iters
       |SELECT node AS part_key, deg AS degree, r AS rank_fp,
       |       CAST(r AS DOUBLE) / ${Scale.toDouble} AS rank
       |FROM it${Iters}r""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q59_copurchase_pagerank" -> copurchasePagerank)

  val oracle: Map[String, String] = Map(
    "q59_copurchase_pagerank" -> pagerankSql)
}
