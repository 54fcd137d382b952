package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval analytics over half-open `[start, end)` spans: peak
  * concurrency (sweep-line) and covered-length of the interval union
  * (gaps-and-islands). Both are per-group window passes, so on a
  * cluster every group sweeps in parallel after one shuffle on the
  * group key — no driver-side event loop. (Extension surface: the
  * reference's temporal handling stops at month-slice filters,
  * transform_lease.py:41-58.)
  *
  * Endpoints are numeric (long-castable): callers map dates/timestamps
  * to epoch days/seconds first, which keeps length arithmetic exact and
  * unit-explicit. Empty or inverted spans (`end <= start`) are
  * rejected — they would silently skew the sweep.
  */
object Intervals {

  /** `groupCols + peak_concurrent`: the maximum number of spans open at
    * any instant, per group. Sweep-line as ONE window pass: +1 at each
    * start, -1 at each end, cumulative-sum in `(t, delta)` order. Ends
    * sort before starts at the same instant (-1 < +1), so touching
    * spans `[a,b) [b,c)` never count as overlapping. The cumulative sum
    * uses the default RANGE frame, so tied instants all read the
    * settled post-tie depth — deterministic under duplicate endpoints.
    */
  def peakConcurrency(df: DataFrame, groupCols: Seq[String],
                      start: Column, end: Column): DataFrame = {
    val g = groupCols.map(col)
    val checked = requireOrdered(df, start, end)
    val deltas = checked
      .select(g :+ start.cast("long").as("__t") :+ lit(1).as("__d"): _*)
      .unionByName(
        checked.select(g :+ end.cast("long").as("__t") :+ lit(-1).as("__d"): _*))
    val sweep = Window.partitionBy(g: _*).orderBy(col("__t"), col("__d"))
    deltas
      .select(g :+ sum(col("__d")).over(sweep).as("__depth"): _*)
      .groupBy(g: _*)
      .agg(max(col("__depth")).cast("long").as("peak_concurrent"))
  }

  /** `groupCols + union_len`: total length covered by the union of the
    * group's spans (overlaps counted once). Gaps-and-islands: a span
    * whose start clears every earlier end opens a new island; islands
    * aggregate to `max(end) - min(start)` and sum. Two window passes
    * over start-sorted spans, per group.
    */
  def unionLength(df: DataFrame, groupCols: Seq[String],
                  start: Column, end: Column): DataFrame = {
    val g = groupCols.map(col)
    val spans = requireOrdered(df, start, end)
      .select(g :+ start.cast("long").as("__s") :+ end.cast("long").as("__e"): _*)
    val byStart = Window.partitionBy(g: _*).orderBy(col("__s"), col("__e"))
    // ROWS frame: RANGE would include tied rows' own ends. Identical
    // (s, e) duplicates make any tie order give the same prior-max.
    val prevMax = max(col("__e"))
      .over(byStart.rowsBetween(Window.unboundedPreceding, -1))
    val opens = when(prevMax.isNull || col("__s") > prevMax, lit(1))
      .otherwise(lit(0))
    val islanded = spans
      .select(g :+ col("__s") :+ col("__e") :+
        sum(opens).over(byStart.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).as("__island"): _*)
    islanded
      .groupBy(g :+ col("__island"): _*)
      .agg((max(col("__e")) - min(col("__s"))).as("__len"))
      .groupBy(g: _*)
      .agg(sum(col("__len")).as("union_len"))
  }

  private def requireOrdered(df: DataFrame, start: Column,
                             end: Column): DataFrame =
    df.where(when(end.cast("long") <= start.cast("long"),
        raise_error(lit("Intervals: end must be strictly after start")))
      .otherwise(lit(true)))
}
