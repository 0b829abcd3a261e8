package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Streaming twin of the sketch family: HLL distinct-count registers
  * (s01/s05), the count-min grid (s02), and the theta sample (s03)
  * maintained continuously over a document stream — the full
  * production sketch feed, not just cardinality.
  *
  * The interesting property is the STATE BOUND: a streaming
  * aggregation's state normally grows with the key domain (why
  * watermarks exist), but the sketch's key space is (source, bucket)
  * with bucket < 256 — the state is constant-size BY CONSTRUCTION, so
  * the query needs no watermark, never expires anything, and is exact
  * over the entire stream history (exact w.r.t. the sketch's own
  * semantics: the registers equal a batch build over everything that
  * ever arrived — SketchStreamSpec pins that equality across
  * micro-batches). This is the live corpus-cardinality dashboard feed:
  * each trigger updates ≤ sources×256 rows, and the served estimate is
  * the s01 literal-table chain over those registers.
  *
  * Mergeability (s05's oracle-checked result) is what makes the
  * topology composable: per-stream registers from independent ingest
  * jobs combine by bucket-wise max downstream without replaying any
  * stream.
  */
object SketchStream {

  /** Continuous HLL registers per (source, bucket) — legal on batch and
    * streaming frames alike; on a stream run it in Update/Complete
    * mode (an unwatermarked stateful agg is fine here precisely
    * because the state cannot grow).
    */
  def hllRegisters(docs: DataFrame): DataFrame =
    Sketches.hllRankStream(Sketches.tokenHashes(docs), "source")
      .groupBy(col("source"), col("bucket"))
      .agg(max(col("rank")).as("reg"))

  /** Continuous count-min grid (s02's state): per (r, bucket) cell
    * counts over every token occurrence that ever arrived. Same state
    * argument as the registers — the aggregation key space is the
    * 4×1024 grid, so the unwatermarked state is constant-size by
    * construction, and grids from independent streams merge by
    * cell-wise SUM (the s02 mergeability contract). Run in
    * Update/Complete mode; the served heavy-hitter estimates are s02's
    * bounded probe join over these cells.
    */
  def cmsCells(docs: DataFrame): DataFrame = Sketches.cmsCells(docs)

  /** Continuous theta sample (s03's state): the distinct (source, h)
    * token hashes below the fixed θ threshold. The dedup state is
    * bounded BY THE FILTER — only the 2⁻⁶ key-range slice is ever
    * retained — so no watermark is needed and the sample equals the
    * batch sample over the full history exactly (fixed-θ, not
    * bottom-k: arrival order cannot change which keys qualify). Run
    * in Append mode; downstream overlap grids intersect these samples
    * exactly as s03 does.
    */
  def thetaSample(docs: DataFrame): DataFrame =
    Sketches.tokenHashes(docs)
      .filter(col("h") < lit(Sketches.thetaThreshold))
      .dropDuplicates("source", "h")
}
