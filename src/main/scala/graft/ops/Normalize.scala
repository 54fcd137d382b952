package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Within-group quantile-rank normalization — make a metric comparable
  * ACROSS heterogeneous groups before a global threshold: raw document
  * lengths (or quality scores) from different sources live on different
  * scales, so "drop the bottom 10%" must mean bottom 10% OF EACH
  * SOURCE, not of the pooled mix where one verbose source monopolizes
  * the top. Each row gets its mid-rank percentile within its group:
  * `(countBelow + (countEqual + 1)/2) / n` — ties share one value, the
  * output is in (0, 1], and a uniform re-expression of any input
  * distribution.
  *
  * Scale shape: the [[Stats.spearman]] grid discipline per group —
  * counts at (group, value) grain, one cumulative window over each
  * group's VALUE GRID (bounded by distinct values, not rows), then a
  * keyed join back. No row-grain sort anywhere.
  *
  * Determinism: `value` must be integer-grain; the percentile is one
  * closed-form division of exact longs, 6-decimal rounded.
  */
object Normalize {

  /** Input columns plus `pctl` (the within-group mid-rank percentile of
    * `valueCol`). Null values keep null `pctl`.
    */
  def quantileRank(df: DataFrame, groupCol: String, valueCol: String)
    : DataFrame = {
    val grid = df.select(col(groupCol).as("__g"), col(valueCol).cast("long")
        .as("__v"))
      .where(col("__v").isNotNull)
      .groupBy(col("__g"), col("__v")).agg(count(lit(1)).as("__n"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__g"))
      .orderBy(col("__v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val totals = grid.groupBy(col("__g")).agg(sum(col("__n")).as("__tot"))
    val ranked = grid
      .select(col("__g"), col("__v"),
        coalesce(sum(col("__n")).over(w), lit(0L)).as("__below"),
        col("__n"))
      .join(totals, "__g")
      .select(col("__g"), col("__v"),
        // mid-rank percentile on the doubled-integer grid (ties share)
        round((col("__below") * 2 + col("__n") + 1).cast("double") /
          (col("__tot") * 2).cast("double"), 6).as("pctl"))
    df.join(ranked,
      col(groupCol) === col("__g") &&
        col(valueCol).cast("long") === col("__v"), "left")
      .drop("__g", "__v")
  }

  /** Per-group z-score standardization of an integer (cents-scaled)
    * column — the feature-scaling twin of [[quantileRank]] for models
    * that want moments, not ranks. Computed from EXACT integer moments
    * in the cross-multiplied form
    * {{{ z = (n·x − S) / sqrt(n·Σx² − S²) }}}
    * (algebraically (x − mean)/sd_pop with both sides scaled by n), so
    * the only floating-point step is one sqrt + one division over
    * exact longs — identical on any engine, no running-mean
    * accumulation order to disagree on. Degenerate groups (n = 1 or
    * zero variance) yield null.
    *
    * The moments accumulate in decimal(38,0): with long arithmetic the
    * cross-multiply `n·Σx²` wraps SILENTLY past 2⁶³ — hit at the sf1
    * certification, where cent-scale balances over 6k-row nation
    * groups put n·Σx² at ~1.2e19. Decimal keeps every step exact; the
    * only floating point remains the final sqrt + division.
    *
    * Shape: one group-grain aggregate broadcast back onto the rows —
    * map-only after the stats join; never a window over the data.
    */
  def zScale(df: DataFrame, groupCol: String, centsCol: String)
    : DataFrame = {
    val cd = col(centsCol).cast("decimal(38,0)")
    val stats = df.groupBy(col(groupCol).as("__g"))
      .agg(count(col(centsCol)).cast("decimal(38,0)").as("__n"),
        sum(cd).as("__s"),
        sum((cd * cd).cast("decimal(38,0)")).as("__ss"))
    val varn = col("__n") * col("__ss") - col("__s") * col("__s")
    // no broadcast HINT: group cardinality is caller-controlled and a
    // forced broadcast of a high-cardinality stats table would OOM the
    // driver — Catalyst/AQE broadcasts on its own when the side is
    // actually small
    df.join(stats, col(groupCol) === col("__g"), "left")
      .withColumn("z",
        when(col("__n") > 1L && varn > 0L,
          round((col("__n") * col(centsCol) - col("__s")).cast("double") /
            sqrt(varn.cast("double")), 6)))
      .drop("__g", "__n", "__s", "__ss")
  }
}
