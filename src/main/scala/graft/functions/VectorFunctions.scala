package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `Array[Float]` embedding columns using native
  * higher-order functions (`zip_with`/`aggregate`/`transform`) — fully
  * codegen-compatible, no UDFs, and all arithmetic in DOUBLE with a
  * deterministic left-fold order (index order), which keeps results
  * bit-identical across engines and runs.
  */
object VectorFunctions {

  /** Cast a float vector to double for stable accumulation. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Dot product via zip_with + left-fold aggregate. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Squared L2 norm. */
  def normSq(v: Column): Column =
    aggregate(transform(v, x => x * x), lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def norm(v: Column): Column = sqrt(normSq(v))

  /** Cosine similarity (double math, index-ordered accumulation). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))
}
