package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Calendar densification for monthly series: materialize EVERY month
  * between each key's first and last observation, zero-filling counts
  * and carrying measures forward (LOCF — last observation carried
  * forward). The warehouse twin of the reference's month-slice loads:
  * downstream consumers (trend models, month-over-month deltas) need
  * the absent months to EXIST, not be implicit. Periods use the
  * reference's `yyyymm` integer convention (transform_lease.py:41-58).
  *
  * Scale shape: per-key span is one aggregate; month generation is a
  * map-side `sequence`/`explode` whose fan-out is the span length (a
  * bounded calendar, not data volume); the join back is co-keyed on
  * (key, month); LOCF is one per-key window pass in month order.
  */
object GapFill {

  /** Contiguous month index of a `yyyymm` int (199612 → 1996*12+11). */
  def monthIndex(yyyymm: Column): Column = {
    val y = yyyymm.cast("long")
    floor(y / lit(100L)) * 12L + pmod(y, lit(100L)) - 1L
  }

  /** Inverse of [[monthIndex]]. */
  def indexToYyyymm(idx: Column): Column =
    (floor(idx / lit(12L)) * 100L + pmod(idx, lit(12L)) + 1L).cast("int")

  /** Densify `df` (one row per key × observed `yyyymm`) to one row per
    * key × EVERY month in the key's observed span. `zeroFill` columns
    * become 0 on generated months; `locf` columns carry the most recent
    * observed value forward (null before the first observation); all
    * other non-key columns are dropped.
    */
  def densifyMonths(df: DataFrame, keyCols: Seq[String], yyyymmCol: String,
                    zeroFill: Seq[String], locf: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyCols required")
    val k = keyCols.map(col)
    val spans = df.groupBy(k: _*)
      .agg(min(monthIndex(col(yyyymmCol))).as("__lo"),
        max(monthIndex(col(yyyymmCol))).as("__hi"))
    val calendar = spans
      .select(k :+ explode(sequence(col("__lo"), col("__hi"))).as("__idx"): _*)
      .select(k :+ indexToYyyymm(col("__idx")).as(yyyymmCol): _*)
    val joined = calendar.join(df, keyCols :+ yyyymmCol, "left")
    val byMonth = Window.partitionBy(k: _*)
      .orderBy(monthIndex(col(yyyymmCol)))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val zeroed = zeroFill.foldLeft(joined) { (acc, c) =>
      acc.withColumn(c, coalesce(col(c), lit(0L)))
    }
    val carried = locf.foldLeft(zeroed) { (acc, c) =>
      acc.withColumn(c, last(col(c), ignoreNulls = true).over(byMonth))
    }
    carried.select(((keyCols :+ yyyymmCol) ++ zeroFill ++ locf).map(col): _*)
  }
}
