package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextAnalysis

/** Continuous twin of the learned-quality stage — MODEL SERVING on
  * the ingest stream: the ridge is trained OFFLINE on the standing
  * corpus (t28's one-aggregation sufficient statistics + driver
  * Cholesky), and its frozen coefficients ride into the stream as
  * literals, scoring every arriving document with the IDENTICAL
  * per-row expression the batch scorer uses (t29/t30) — train-batch /
  * serve-stream, the deployment split every production quality gate
  * runs (retraining happens offline on a schedule; the stream never
  * solves).
  *
  * This is deliberately the STATELESS streaming shape: the round-12
  * per-row feature rework (higher-order array functions instead of an
  * explode + groupBy + join-back) is what makes the whole scorer a
  * projection, so there is no aggregation state, no watermark, and
  * exactly-once comes from the transactional file sink alone (the
  * FactStream discipline). QualityStreamSpec pins stream == batch
  * scoring across multi-batch feeds.
  *
  * Scale: per-batch cost is one codegen-friendly projection over the
  * arrivals — no shuffle at all; at 100 TB/day of arrivals this is
  * the embarrassingly parallel stage of the pipeline.
  */
object QualityStream {

  /** Train the frozen model from a REFERENCE corpus dir (the offline
    * half — t28's exact-integer sums + driver solve).
    */
  def trainModel(spark: org.apache.spark.sql.SparkSession,
                 dir: String): Array[Double] =
    TextAnalysis.ridgeSolve(TextAnalysis.ridgeFeatures(
      graft.sources.Tables.documents(spark, dir)))

  /** The scored stream: (doc_id, source, weak_label, score, keep) per
    * arriving doc — a pure projection of `docs` (streaming or batch).
    */
  def scored(docs: DataFrame, model: Array[Double]): DataFrame =
    TextAnalysis.ridgeScore(docs, model)

  /** Start the exactly-once file-sink write of the scored stream. */
  def run(scoredDocs: DataFrame, path: String,
          checkpoint: String): StreamingQuery =
    scoredDocs.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()
}
