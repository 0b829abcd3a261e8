package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.Scd2

/** Streaming dimension maintenance — the reference's SCD2 load
  * (/root/reference/etl/load.py:246-319) as a CONTINUOUS process:
  * dimension snapshot updates arrive on a stream (a CDC feed, a
  * master-data topic) and every micro-batch MERGEs into the persisted
  * dimension. Structured Streaming's native file sinks are
  * append-shaped; a dimension merge is an upsert, and `foreachBatch` is
  * the bridge the engine provides for exactly this — each micro-batch
  * runs the SAME set-based Scd2.mergeInto the batch pipeline uses, so
  * stream and batch share one merge implementation and there are no
  * divergent SCD2 semantics to reconcile (DimStreamSpec asserts the
  * streamed dimension equals the sequential batch merges row-for-row).
  *
  * Scale: state lives in the persisted dimension, not in stream state —
  * each batch pays Scd2.merge's one full-outer join, with the incoming
  * side pre-collapsed to one snapshot row per key. Re-delivery is
  * absorbed by the row_hash change detection: replaying a batch whose
  * rows already merged lands every key on the `unchanged` branch, so
  * the sink is idempotent under at-least-once delivery as long as
  * `mergeTsOf` is a pure function of the batch id (never wall-clock).
  */
object DimStream {

  /** Collapse a micro-batch to its LAST update per key: a batch may
    * carry several updates for one key, and the SCD2 contract takes one
    * snapshot row per key. `max_by` over the strictly-monotone
    * `orderCol` (an offset / CDC log sequence number), map-side
    * combinable — never a per-key window over the batch.
    */
  private[graft] def lastPerKey(batch: DataFrame, key: String, orderCol: String): DataFrame = {
    val attrs = batch.columns.filterNot(c => c == key || c == orderCol).toSeq
    batch.groupBy(col(key))
      .agg(max_by(struct(attrs.map(col): _*), col(orderCol)).as("r"))
      .select(col(key) +: attrs.map(a => col(s"r.$a").as(a)): _*)
  }

  /** foreachBatch SCD2 sink: a writer that merges each micro-batch of
    * snapshot rows (`key`, attrs…, `row_hash`, `orderCol`) into the
    * parquet dimension at `path`. `mergeTsOf` maps the batch id to the
    * batch's effective timestamp — a pure function, so a replayed batch
    * produces the identical merge.
    */
  def scd2Sink(incoming: DataFrame, path: String, key: String, orderCol: String,
               mergeTsOf: Long => Column): DataStreamWriter[Row] =
    incoming.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Scd2.mergeInto(batch.sparkSession, path,
          lastPerKey(batch, key, orderCol), key, mergeTsOf(batchId))
        ()
      }
}
