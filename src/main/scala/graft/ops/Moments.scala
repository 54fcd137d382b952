package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared exact-integer moment aggregation for the closed-form stats
  * operators ([[Trend]], [[Stats]]): Σx, Σy, Σxy, Σx² (and optionally
  * Σy²) as longs, with incomplete pairs (null x or y) EXCLUDED — the
  * pairwise-deletion convention Spark's own `corr`/`regr_slope` use.
  * One copy of the overflow-envelope-critical scaffolding, so a future
  * rebase or guard lands in every consumer at once.
  */
private[ops] object Moments {

  /** `groupCols + n + __sx + __sy + __sxy + __sxx [+ __syy]` over the
    * complete (non-null) pairs.
    */
  def of(df: DataFrame, groupCols: Seq[String], x: Column, y: Column,
         withYY: Boolean): DataFrame = {
    val g = groupCols.map(col)
    val base = df
      .select(g :+ x.cast("long").as("__x") :+ y.cast("long").as("__y"): _*)
      .where(col("__x").isNotNull && col("__y").isNotNull)
    val aggs = Seq(
      sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
      sum(col("__x") * col("__y")).as("__sxy"),
      sum(col("__x") * col("__x")).as("__sxx")) ++
      (if (withYY) Seq(sum(col("__y") * col("__y")).as("__syy")) else Nil)
    base.groupBy(g: _*).agg(count(lit(1)).as("n"), aggs: _*)
  }
}
