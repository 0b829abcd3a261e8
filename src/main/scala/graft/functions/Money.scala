package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact-decimal money arithmetic for aggregates.
  *
  * Floating sums of product-derived amounts (price × (1−discount) …)
  * land on exact half-cent midpoints where the rounded result depends on
  * partition order AND on engine rounding mode — observed as a 1-cent
  * flip between 4-thread and 32-thread runs. Summing in DECIMAL is
  * exact for any parallelism, and `round` on DECIMAL is half-up in both
  * Spark and DuckDB, so `roundedDouble(sum(...decimal...))` is fully
  * deterministic. Precisions are sized so no product chain exceeds
  * precision 38 (which would trigger scale-loss rounding):
  * (12,2) × (4,2) → (17,4); × (4,2) → (22,6); sum → (32,6).
  */
object Money {
  /** 2-decimal money column (prices, balances, event values). */
  def m2(c: Column): Column = c.cast("decimal(12,2)")

  /** 3-decimal money column (o_totalprice carries mills). */
  def m3(c: Column): Column = c.cast("decimal(14,3)")

  /** Rate in [0,1] with 2 decimals (discount, tax). */
  def r2(c: Column): Column = c.cast("decimal(3,2)")

  /** Decimal literal 1.00. */
  val one: Column = lit(1).cast("decimal(3,2)")

  /** Net line revenue: price × (1 − discount), exact. */
  def net(price: Column, discount: Column): Column = m2(price) * (one - r2(discount))

  /** Charged amount: price × (1 − discount) × (1 + tax), exact. */
  def charge(price: Column, discount: Column, tax: Column): Column =
    net(price, discount) * (one + r2(tax))

  /** Decimal aggregate → rounded(2) double output (engine-stable). */
  def out2(decimalAgg: Column): Column = round(decimalAgg, 2).cast("double")

  /** Decimal aggregate → unrounded double (for ratio numerators). */
  def outRaw(decimalAgg: Column): Column = decimalAgg.cast("double")
}
