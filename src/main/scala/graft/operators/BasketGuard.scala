package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Loud basket-width guard for the pair-explosion family (q53 basket
  * affinity, q59 PageRank, q60 triangles — every operator that fans a
  * per-order item set out to its pairs).
  *
  * The family's scale argument is that pair generation is linear in
  * the fact table TIMES the square of the per-basket distinct-item
  * width: the TPC-H-shaped test tables bound that width at ≤ 7 items /
  * ≤ 25 brands, so the quadratic term is a small constant there. A
  * catalog with much richer baskets (a marketplace order with 10⁴
  * distinct parts) grows the fan-out quadratically IN THE WIDTH — the
  * one regime where these plans stop being linear. Design bound: at
  * [[MaxBasketWidth]] = 256 the per-order fan-out is ≤ C(256,2) ≈ 33k
  * pairs — a large but flat constant per order; past it the operator
  * must FAIL LOUDLY rather than quietly burn a quadratic shuffle
  * (round-10 verdict watch item 2).
  *
  * The census is the cheapest possible full-data probe: one
  * map-side-combining count per order key collapsed to a 1-row max —
  * no sort, no window, bounded driver transfer (1 row). Callers that
  * build baskets anyway (q53) fold the width check into their existing
  * census pass instead and gate pair EMISSION in-expression, so the
  * quadratic leg never runs on an oversized basket.
  */
object BasketGuard {

  /** Max per-order distinct items (parts / brands) the pair-explosion
    * plans accept. Past this, pair fan-out per order exceeds ~33k rows
    * and the family's linear-in-fact scale claim no longer holds.
    */
  private[graft] val MaxBasketWidth = 256

  /** Thrown when a basket exceeds [[MaxBasketWidth]] — loud, with the
    * measured width and the escalation path in the message.
    */
  final class BasketTooWideException(what: String, width: Long, bound: Int)
    extends IllegalArgumentException(
      s"$what: widest basket has $width distinct items, design bound is " +
        s"$bound — pair fan-out would be quadratic in that width. " +
        "Pre-aggregate to a coarser item rollup (brand/category) or cap " +
        "baskets upstream before running the pair-explosion family.")

  /** Require every order's distinct-item width ≤ `bound`. `items` must
    * be a (orderCol, itemCol) projection with per-order duplicates
    * already removed (the callers' `.distinct()` frame). One cheap
    * action: count per order (partial-aggregable) → 1-row max.
    */
  private[graft] def requireWidth(items: DataFrame, orderCol: String,
      what: String, bound: Int = MaxBasketWidth): Unit = {
    val row = items.groupBy(col(orderCol)).agg(count(lit(1)).as("w"))
      .agg(max(col("w")).as("mx")).collect()(0)
    val mx = if (row.isNullAt(0)) 0L else row.getLong(0)
    if (mx > bound) throw new BasketTooWideException(what, mx, bound)
  }
}
