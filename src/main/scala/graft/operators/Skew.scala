package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for pathological key distributions — the manual
  * complement to AQE's skew-join splitting, for when one join key holds
  * a double-digit percentage of the fact table and even a split
  * partition overwhelms its executor.
  *
  * `saltedJoin` spreads each hot key over `saltBuckets` shuffle
  * partitions by appending a deterministic salt derived from a
  * high-cardinality column of the large side, and replicating the small
  * side once per salt value. Semantics are exactly those of the plain
  * equi-join (asserted in SkewSpec).
  */
object Skew {

  /** Add a deterministic salt column in [0, saltBuckets). */
  def withSalt(df: DataFrame, from: Column, saltBuckets: Int): DataFrame =
    df.withColumn("_salt", pmod(hash(from), lit(saltBuckets)))

  /** Replicate `small` once per salt value (explode of a literal range —
    * broadcast-sized inputs only).
    */
  def replicated(small: DataFrame, saltBuckets: Int): DataFrame =
    small.withColumn("_salt", explode(sequence(lit(0), lit(saltBuckets - 1))))

  /** Equi-join `large ⋈ small` on `key`, spreading each key over
    * `saltBuckets` partitions. `saltFrom` must be a (near-)unique column
    * of `large` so rows of a hot key scatter evenly.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltFrom: Column, saltBuckets: Int): DataFrame =
    withSalt(large, saltFrom, saltBuckets)
      .join(replicated(small, saltBuckets), Seq(key, "_salt"))
      .drop("_salt")
}
