package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming fact ingest — the CONTINUOUS twin of q47's daily loads:
  * a stream of lineitem-grain rows joins the STATIC order/part dims
  * (a stream-static join: the static sides broadcast into every
  * micro-batch, no stream-side state) through the SAME frame-level
  * builder as the batch fact (Facts.factSalesFrom — batch and
  * streaming facts are definitionally identical), and lands in the
  * month-partitioned fact warehouse through Spark's transactional
  * FILE SINK. The sink's metadata log is what makes this production-
  * shaped: a restarted or retried micro-batch commits its files
  * exactly once — the streaming analog of q47's idempotent
  * dynamic-partition re-runs, provided by the engine instead of by
  * overwrite semantics.
  *
  * Scale: the only shuffle is the grain join's (and AQE usually
  * broadcasts the slim orders projection); partitionBy splits files
  * by month WITHIN each task, and a real deployment bounds per-batch
  * file counts with the same repartition-on-partition-column move as
  * the batch loader. FactStreamSpec pins stream == batch row identity
  * across multi-batch feeds that revisit the same month partitions.
  */
object FactStream {

  /** Lineitem-grain input row (the columns the fact derivation reads). */
  case class LineitemEvent(l_orderkey: Long, l_partkey: Long,
                           l_linenumber: Int, l_quantity: Double,
                           l_extendedprice: Double, l_discount: Double,
                           l_tax: Double)

  /** The streaming fact frame: stream-static fact derivation plus the
    * month partition key. `li` is a STREAMING frame; `orders`/`part`
    * are static dims.
    */
  def factStream(li: DataFrame, orders: DataFrame, part: DataFrame): DataFrame =
    graft.operators.Facts.factSalesFrom(li, orders, part)
      .withColumn("month_key", floor(col("date_key") / 100).cast("long"))

  /** Start the exactly-once partitioned file-sink write. */
  def run(fact: DataFrame, path: String, checkpoint: String): StreamingQuery =
    fact.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("month_key")
      .outputMode("append")
      .start()
}
