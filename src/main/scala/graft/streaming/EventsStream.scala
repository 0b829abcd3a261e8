package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming surface of the event pipeline — the streaming
  * twins of the batch operators in graft.operators.Events (same column
  * logic, verified against them in EventsStreamSpec).
  *
  * Scale notes: watermarks bound all window state; the stateful
  * sessionizer keys state by user_id (bounded per-user footprint) and is
  * the shape that runs continuously on a cluster — state lives in the
  * state store, not the driver.
  */
object EventsStream {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class UserStats(user_id: Long, n_events: Long, total_value: Double,
                       last_epoch: Long)

  /** Hourly tumbling windowed aggregation with a 2-hour watermark —
    * streaming twin of Events.tumblingWindows. `approx_count_distinct`
    * replaces exact distinct (exact per-key distinct is unbounded state
    * in a stream).
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"),
        approx_count_distinct(col("user_id")).as("approx_users"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"), col("approx_users"))

  /** Stateful per-user running stats via mapGroupsWithState (Update
    * mode) — the custom-state building block the reference's pipeline
    * monitor would use for live per-entity counters.
    */
  def runningUserStats(events: Dataset[Event]): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserStats, UserStats](GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserStats]) =>
          val prev = state.getOption.getOrElse(UserStats(userId, 0L, 0.0, 0L))
          val next = batch.foldLeft(prev) { (s, e) =>
            UserStats(userId, s.n_events + 1,
              s.total_value + e.value,
              math.max(s.last_epoch, e.ts.getTime / 1000))
          }
          state.update(next)
          next
      }
  }

  /** Streaming twin of e06's DAU column: exact daily active users via
    * CHAINED stateful operators — bounded-state dedup to (user, day)
    * first (`dropDuplicatesWithinWatermark`, the stream-legal stand-in
    * for countDistinct, whose state a stream can't bound), then a
    * watermarked daily window COUNT of the deduped rows. Two stateful
    * operators in one query share the event-time watermark — the shape
    * Structured Streaming supports for exactly this dedup-then-aggregate
    * pattern. On a static frame both stages degrade to their batch
    * forms and the function is its own batch twin (asserted in
    * StreamingSpec).
    */
  def dailyActiveUsers(events: DataFrame): DataFrame = {
    val dayRows = events.select(col("ts"), col("user_id"), to_date(col("ts")).as("d"))
    val deduped =
      if (events.isStreaming)
        dayRows.withWatermark("ts", "1 day")
          .dropDuplicatesWithinWatermark("user_id", "d")
      else dayRows.dropDuplicates("user_id", "d")
    deduped
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("dau"))
      .select(col("w.start").cast("date").as("activity_date"), col("dau"))
  }

  /** Watermarked stream-stream inner join — purchase→click attribution
    * (the streaming counterpart of the q23 as-of attribution): each
    * purchase joins the same user's clicks from the hour before it.
    * Both sides carry event-time watermarks and the join condition
    * bounds event-time distance, so the state store can expire buffered
    * rows — the only shape in which a stream-stream join survives an
    * unbounded stream. On static frames the watermarks are no-ops and
    * the function is its own batch twin (asserted in StreamingSpec).
    */
  def purchaseClickJoin(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.withWatermark("ts", "2 hours")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val p = purchases.withWatermark("ts", "2 hours")
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value"))
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        col("click_ts"), col("purchase_ts"), col("value"))
  }

  /** Gap-bucket projection shared by the continuous census and its
    * batch twin — attribution latency quantized to a 4-value key
    * (≤5 min / ≤15 / ≤30 / ≤60: the join window bounds the gap).
    */
  private[graft] def gapBuckets(pairs: DataFrame): DataFrame =
    pairs
      .withColumn("gap_sec",
        unix_timestamp(col("purchase_ts")) - unix_timestamp(col("click_ts")))
      .withColumn("gap_bucket",
        when(col("gap_sec") <= 300L, "<=5m")
          .when(col("gap_sec") <= 900L, "<=15m")
          .when(col("gap_sec") <= 1800L, "<=30m")
          .otherwise("<=60m"))

  /** Continuous attribution-latency census over [[purchaseClickJoin]]
    * — the live "how stale was the click that converted" distribution.
    * A stream-stream join may only run in Append mode, and a
    * time-interval join is exactly the shape Spark's global-watermark
    * check refuses to chain a stateful aggregation behind (matched
    * pairs can surface with event times behind the downstream
    * watermark). So the census rides the CurationStream pattern
    * instead: foreachBatch folds each micro-batch's pairs into
    * per-batch bucket counts keyed `batch=<id>` — a replayed batch
    * overwrites only its own partition (at-least-once replay is
    * idempotent), and [[servedAttributionCensus]] serves the standing
    * census as the sum over partitions. No chained stateful operator,
    * no correctness escape hatch, bounded 4-row state per batch.
    */
  def attributionCensusStart(clicks: DataFrame, purchases: DataFrame,
                             outDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    purchaseClickJoin(clicks, purchases)
      .writeStream.outputMode(OutputMode.Append())
      .option("checkpointLocation", s"$outDir/_ckpt")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        // written unconditionally: an isEmpty pre-check would execute the
        // joined micro-batch TWICE per trigger (once for the probe, once
        // for the write), and skipping empty batches would leave the
        // census path nonexistent until the first conversion — an empty
        // per-batch frame writes its schema and folds to zero rows
        gapBuckets(batch.toDF())
          .groupBy(col("gap_bucket"))
          .agg(count(lit(1)).as("n_pairs"))
          .write.mode("overwrite").parquet(s"$outDir/census/batch=$id")
      }
      .start()

  /** The standing census after any number of triggers — an EMPTY census
    * (zero rows) before the first trigger has committed, never an error.
    */
  def servedAttributionCensus(spark: SparkSession, outDir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$outDir/census")
    val exists = p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
    if (!exists) {
      import spark.implicits._
      Seq.empty[(String, Long)].toDF("gap_bucket", "n_pairs")
    } else
      spark.read.parquet(s"$outDir/census")
        .groupBy(col("gap_bucket"))
        .agg(sum(col("n_pairs")).as("n_pairs"))
  }

  /** Batch twin: identical census from static frames in one shot. */
  def attributionCensusBatch(clicks: DataFrame, purchases: DataFrame): DataFrame =
    gapBuckets(purchaseClickJoin(clicks, purchases))
      .groupBy(col("gap_bucket"))
      .agg(count(lit(1)).as("n_pairs"))

  /** Run a streaming query over `df` into an in-memory sink and block
    * until the source drains — the local smoke harness.
    */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode): DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    df.sparkSession.table(name)
  }
}
