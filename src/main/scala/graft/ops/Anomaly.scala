package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust per-group outlier detection on median / MAD (median absolute
  * deviation) — the heavy-tail-safe sibling of the mean/stddev z-score:
  * one wild value shifts a mean arbitrarily but moves a median not at
  * all, so MAD flags the wild value instead of masking it. The natural
  * data-quality escalation of the reference's fixed-threshold DQ gates
  * (sql/dq_rollup_check.sql): instead of a hand-picked bound per table,
  * the bound adapts to each group's own dispersion.
  *
  * Exactness contract: `value` should be integer-grain (cents, not
  * dollars — see [[graft.ops.Casts]] for tolerant converters). Spark's
  * exact `percentile(…, 0.5)` then interpolates two integers, which is
  * exact in a double, so medians, MADs, and every outlier verdict are
  * bit-reproducible across engines (the DuckDB twin is
  * `quantile_cont(…, 0.5)`).
  *
  * Scale shape: exact `percentile` shuffles each group's values to one
  * reducer — right for groups up to ~10⁸ rows. Beyond that, switch to
  * the mergeable GK sketch ([[graft.functions.QuantileSketch]]) and
  * accept its ε-rank envelope; same API shape, sketch-sized shuffle.
  */
object Anomaly {

  /** `groupCols + n + med + mad`: per-group size, exact median, exact
    * median-absolute-deviation.
    */
  def madStats(df: DataFrame, groupCols: Seq[String], value: Column): DataFrame = {
    val g = groupCols.map(col)
    val meds = df.groupBy(g: _*)
      .agg(count(lit(1)).as("n"),
        percentile(value.cast("double"), lit(0.5)).as("med"))
    val withMed = df.select(g :+ value.cast("double").as("__v"): _*)
      .join(meds, groupCols)
    withMed.groupBy(g: _*)
      .agg(first(col("n")).as("n"), first(col("med")).as("med"),
        percentile(abs(col("__v") - col("med")), lit(0.5)).as("mad"))
  }

  /** Input rows + `med`, `mad`, `is_outlier` where the outlier verdict
    * is `|v - med| > k * mad` (strict — an all-equal group has mad 0 and
    * flags only values that differ from the median at all when k > 0).
    */
  def flagOutliers(df: DataFrame, groupCols: Seq[String], value: Column,
                   k: Double): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    val stats = madStats(df, groupCols, value).drop("n")
    df.join(stats, groupCols)
      .withColumn("is_outlier",
        abs(value.cast("double") - col("med")) > lit(k) * col("mad"))
  }

  /** Input rows + `p_lo`, `p_hi`, `winsorized`: the value clipped into
    * its group's exact [pLo, pHi] percentile band — the tail-taming
    * complement of [[flagOutliers]] (flagging asks "which rows are
    * wild"; winsorizing asks "what would the aggregate be if the tails
    * couldn't drag it"). Same exactness contract as [[madStats]]:
    * integer-grain values, exact interpolated `percentile` on both
    * engines.
    */
  def winsorize(df: DataFrame, groupCols: Seq[String], value: Column,
                pLo: Double, pHi: Double): DataFrame = {
    require(0 <= pLo && pLo < pHi && pHi <= 1, s"need 0 <= $pLo < $pHi <= 1")
    val bands = df.groupBy(groupCols.map(col): _*)
      .agg(percentile(value.cast("double"), lit(pLo)).as("p_lo"),
        percentile(value.cast("double"), lit(pHi)).as("p_hi"))
    df.join(bands, groupCols)
      .withColumn("winsorized",
        greatest(least(value.cast("double"), col("p_hi")), col("p_lo")))
  }
}
