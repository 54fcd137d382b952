package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pareto-frontier (skyline) extraction — "the orders no other order
  * beats on BOTH price and speed". A row survives when no other row in
  * its group is at-least-as-good on both axes and strictly better on
  * one (minimize `x`, maximize `y`; flip a sign to change direction).
  *
  * The naive formulation is the quadratic NOT-EXISTS anti-join; the
  * sort-based identity this implements is the standard O(n log n)
  * sweep: order each group by (x asc, y desc, tiebreak), and a row is
  * on the frontier iff its y STRICTLY exceeds the running maximum y
  * over all preceding rows. Everything before it in that order has
  * x ≤ this row's x (ties on x see higher-y rows first), so "beaten by
  * the running max" IS 2-D dominance — no self-join, no n² pairs.
  *
  * Coincident duplicate points keep ONE representative (the smallest
  * under `tieCols`) — a duplicate neither dominates nor extends the
  * frontier, and emitting both would make "frontier size" double-count.
  *
  * Scale shape: one partitioned window sort per group — the same
  * single-shuffle shape as any per-group top-k. For a GLOBAL skyline
  * (no group columns) the window degenerates to one task; callers at
  * corpus scale should pre-filter with a coarse grid (per-x-bucket
  * local skylines are a superset of the global one, so a grid pass
  * first is lossless) — the per-group form here is the engine
  * primitive both run on.
  */
object Skyline {

  /** Frontier rows of `df` per `groupCols`, minimizing `xCol` and
    * maximizing `yCol`; `tieCols` must make the sort total.
    */
  def frontier2D(df: DataFrame, groupCols: Seq[String], xCol: String,
                 yCol: String, tieCols: Seq[String]): DataFrame = {
    val order = (col(xCol).asc +: col(yCol).desc +: tieCols.map(col(_).asc))
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__prev_max", max(col(yCol)).over(w))
      .where(col("__prev_max").isNull || col(yCol) > col("__prev_max"))
      .drop("__prev_max")
  }
}
