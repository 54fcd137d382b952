package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Clamped running balance — stock-on-hand semantics: per key, apply
  * signed movements in time order with the balance FLOORED AT ZERO
  * (you cannot ship stock you don't have; the deficit is lost demand,
  * not negative inventory). The naive formulation is the sequential
  * recursion `b_t = max(0, b_{t−1} + d_t)` — per-row, unparallelizable.
  * This implements the closed-form scan identity instead:
  * {{{
  *   b_t = P_t − min(0, min_{s ≤ t} P_s)        (P = prefix sums)
  * }}}
  * i.e. the clamp only ever "forgives" the deepest prefix deficit seen
  * so far — two standard window scans (running sum, running min), no
  * recursion, same single-shuffle shape as any per-key window. The
  * spec proves the identity against the sequential recursion.
  *
  * Also emits `lost_units` — the per-row demand the clamp swallowed
  * (`(b_{t−1} + d_t)` below zero), derivable from the same scans —
  * which is the number a replenishment planner actually wants.
  */
object Inventory {

  /** @param df one row per movement; `deltaCol` signed units
    * @return df + (balance, lost_units) in `order` per key
    */
  def clampedBalance(df: DataFrame, keys: Seq[String], order: Seq[Column],
                     deltaCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__p", sum(col(deltaCol)).over(w))
      .withColumn("__floor", least(lit(0L), min(col("__p")).over(w)))
      // balance before this row's clamp = prior balance + delta
      .withColumn("__prior_floor",
        least(lit(0L), coalesce(min(col("__p")).over(prev), lit(0L))))
      .withColumn("balance", col("__p") - col("__floor"))
      .withColumn("lost_units",
        greatest(lit(0L), col("__prior_floor") - col("__p")))
      .drop("__p", "__floor", "__prior_floor")
  }
}
