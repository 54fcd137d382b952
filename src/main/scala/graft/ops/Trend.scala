package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group least-squares trend (slope + intercept) over an integer
  * time axis — "is this supplier's revenue rising?" asked of every
  * group at once. Instead of `regr_slope`'s running double sums (whose
  * accumulation order differs per engine and partitioning), the five
  * moments Σx, Σy, Σxy, Σx², n aggregate as EXACT integers and the
  * slope is ONE double division at the end:
  *
  *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
  *
  * so results are bit-reproducible across engines, partitionings, and
  * reruns — the same determinism discipline as the integer-cents
  * median/MAD ops ([[Anomaly]]).
  *
  * Overflow envelope: the numerator terms are `n · Σ(x·y)`; with x an
  * epoch-month index (≲ 10³ after [[GapFill.monthIndex]]) and y in
  * cents, a group stays inside long range up to roughly 10¹⁵ total
  * cent-months — callers with larger groups should rebase x to the
  * group's own origin (x − min x), which also conditions the
  * denominator. Rebasing changes the intercept's meaning (origin =
  * group start), not the slope.
  *
  * Scale shape: one group-grain partial-aggregated shuffle carrying
  * five longs per group; the division is map-only on the tiny result.
  */
object Trend {

  /** `groupCols + n + slope + intercept`: least-squares fit of `y`
    * against `x` per group. Groups with fewer than 2 distinct x values
    * have an undefined slope → null slope/intercept (the SQL
    * convention), never a divide-by-zero.
    */
  def linearTrend(df: DataFrame, groupCols: Seq[String], x: Column,
                  y: Column): DataFrame = {
    // shared moment scaffolding (pairwise deletion of null x/y)
    val moments = Moments.of(df, groupCols, x, y, withYY = false)
    val den = col("n") * col("__sxx") - col("__sx") * col("__sx")
    val slope = when(den =!= 0L,
      (col("n") * col("__sxy") - col("__sx") * col("__sy")).cast("double")
        / den.cast("double"))
    val intercept = when(den =!= 0L,
      (col("__sy").cast("double") - col("slope") * col("__sx").cast("double"))
        / col("n").cast("double"))
    moments
      .withColumn("slope", slope)
      .withColumn("intercept", intercept)
      .drop("__sx", "__sy", "__sxy", "__sxx")
  }
}
