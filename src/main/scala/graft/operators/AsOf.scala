package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Generic as-of (most-recent-at-or-before) join — an operator Spark
  * lacks natively, composed from built-ins via the union + running-last
  * pattern (preference (a) from the custom-operator ladder: no custom
  * physical node needed because the composition is already the optimal
  * distributed shape).
  *
  * Why this shape scales: a naive `l JOIN r ON key AND r.ts <= l.ts` +
  * rank explodes to |matches-per-key| rows before pruning; the union
  * form shuffles each input ONCE on the key, sorts within partition,
  * and carries the latest right row forward with a running `last()` —
  * O(n log n) per key group, no intermediate blow-up, AQE-friendly.
  */
object AsOf {

  /** As-of join `left` to the most recent `right` row with
    * `right.ts <= left.ts` for the same key. Right payload columns come
    * back nested in a `prior` struct (null when no prior row exists).
    *
    * Tie-break: at equal timestamps right rows sort before left (so a
    * same-instant right row matches), and among themselves by the
    * payload struct (ts first, then `payload` order) — fully
    * deterministic.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               payload: Seq[String]): DataFrame = {
    val pStruct = struct((ts +: payload).map(col): _*)
    val leftCols = left.columns.toSeq
    val lStruct = struct(leftCols.map(col): _*)
    val r2 = right.select(col(key).as("_k"), col(ts).as("_t"),
      lit(0).as("_side"), pStruct.as("_p"))
    val l2pre = left.select(col(key).as("_k"), col(ts).as("_t"),
      lit(1).as("_side"), lStruct.as("_l"))
    // align schemas for the union: each side carries the other's struct as null
    val l2 = l2pre.withColumn("_p", lit(null).cast(r2.schema("_p").dataType))
      .select(col("_k"), col("_t"), col("_side"), col("_p"), col("_l"))
    val r3 = r2.withColumn("_l", lit(null).cast(l2pre.schema("_l").dataType))
      .select(col("_k"), col("_t"), col("_side"), col("_p"), col("_l"))
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_side"), col("_p"))
      .rowsBetween(Window.unboundedPreceding, 0)
    l2.unionByName(r3)
      .withColumn("prior", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select((leftCols.map(c => col(s"_l.$c").as(c)) :+ col("prior")): _*)
  }

  // ─── q23 as-of join: purchase → most recent prior click/view ─────────
  def purchaseAttribution(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val engagement = e.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    asOfJoin(purchases, engagement, key = "user_id", ts = "ts",
      payload = Seq("event_id", "event_type"))
      .select(
        col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("ts_epoch"),
        col("value"),
        col("prior.event_id").as("prior_event_id"),
        col("prior.event_type").as("prior_event_type"),
        unix_timestamp(col("prior.ts")).as("prior_ts_epoch"),
        (unix_timestamp(col("ts")) - unix_timestamp(col("prior.ts"))).as("gap_sec"),
        col("prior").isNotNull.as("has_prior"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q23_asof_join" -> purchaseAttribution)

  val oracle: Map[String, String] = Map(
    "q23_asof_join" ->
      """WITH l AS (SELECT * FROM events WHERE event_type = 'purchase'),
        |r AS (SELECT * FROM events WHERE event_type IN ('click', 'view')),
        |c AS (
        |  SELECT l.event_id, l.user_id,
        |         CAST(floor(epoch(l.ts)) AS BIGINT) AS ts_epoch, l.value,
        |         r.event_id AS prior_event_id, r.event_type AS prior_event_type,
        |         CAST(floor(epoch(r.ts)) AS BIGINT) AS prior_ts_epoch,
        |         row_number() OVER (PARTITION BY l.event_id
        |                            ORDER BY r.ts DESC, r.event_id DESC) AS rn
        |  FROM l LEFT JOIN r ON l.user_id = r.user_id AND r.ts <= l.ts)
        |SELECT event_id, user_id, ts_epoch, value,
        |       prior_event_id, prior_event_type, prior_ts_epoch,
        |       ts_epoch - prior_ts_epoch AS gap_sec,
        |       prior_event_id IS NOT NULL AS has_prior
        |FROM c WHERE rn = 1""".stripMargin)
}
