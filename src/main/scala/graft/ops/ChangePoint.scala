package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Single change-point detection by the max-mean-shift scan (the CUSUM
  * / binary-segmentation first step): over a series, find the split
  * that maximizes the standardized gap between segment means,
  * `|mean_L − mean_R| · sqrt(n_L·n_R / n)` — "WHEN did the level of
  * this metric move", the question drift scores ([[Drift]]) answer only
  * with "somewhere in this batch". Recursing into the two halves gives
  * full binary segmentation; the scan is the primitive.
  *
  * Scale shape: input is a SERIES (one row per tick — pre-aggregate to
  * day/month grain first), so the one ordered window pass and the
  * argmax run over thousands of rows, not the data. Prefix sums are
  * exact longs; each candidate's score is closed-form double from
  * exact integers, rounded to a fixed 9-decimal grid BEFORE the argmax
  * so the winning split is engine-stable, with the tick as tiebreak.
  */
object ChangePoint {

  /** One row: `split_tick` (last tick of the left segment), segment
    * sizes, segment means, and the shift score — the argmax over all
    * n−1 candidate splits. `valueCol` must be integer-grain.
    */
  def meanShiftScan(df: DataFrame, tickCol: String, valueCol: String)
    : DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(tickCol))
    val cum = sum(col(valueCol).cast("long"))
      .over(w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
    val rn = row_number().over(w)
    val totals = df.agg(count(lit(1)).as("__n"),
      sum(col(valueCol).cast("long")).as("__tot"))
    val staged = df.select(col(tickCol).as("split_tick"),
        cum.as("__cum"), rn.cast("long").as("__rn"))
      .crossJoin(broadcast(totals))
      .where(col("__rn") < col("__n"))
    val ml = col("__cum").cast("double") / col("__rn").cast("double")
    val mr = (col("__tot") - col("__cum")).cast("double") /
      (col("__n") - col("__rn")).cast("double")
    val score9 = round(abs(ml - mr) *
      sqrt(col("__rn").cast("double") *
        (col("__n") - col("__rn")).cast("double") /
        col("__n").cast("double")), 9)
    staged
      .select(col("split_tick"), col("__rn").as("n_left"),
        (col("__n") - col("__rn")).as("n_right"),
        round(ml, 6).as("mean_left"), round(mr, 6).as("mean_right"),
        score9.as("__s9"))
      .orderBy(col("__s9").desc, col("split_tick"))
      .limit(1)
      .select(col("split_tick"), col("n_left"), col("n_right"),
        col("mean_left"), col("mean_right"),
        round(col("__s9"), 6).as("shift_score"))
  }
}
