package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function surface.
  *
  * The reference itself uses no window functions (SURVEY.md §2.5 W1) —
  * this is the deterministic upgrade path it implies: `first(ignoreNulls)`
  * pick-one semantics become `row_number` over an explicit order, plus
  * the running-total / sessionization shapes any monthly-production
  * analytics layer ends up needing. All single-shuffle on the partition
  * key.
  */
object Windows {

  /** One row per key: the first row under `order` (deterministic when
    * `order` is total). The deterministic form of A1's pick-one.
    */
  def latestPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Running total of `measure` per key under `order`. */
  def runningTotal(df: DataFrame, keys: Seq[String], order: Seq[Column],
                   measure: Column, as: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(as, sum(measure).over(w))
  }

  /** Gap-based sessionization: a new session starts when the time since
    * the previous event (per key, under `order`) exceeds `gapSeconds`.
    * Adds a 1-based `session_id` per key.
    */
  def sessionize(df: DataFrame, key: String, ts: String,
                 order: Seq[Column], gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(order: _*)
    val gap = unix_timestamp(col(ts)) - unix_timestamp(lag(col(ts), 1).over(w))
    val isNew = when(gap.isNull || gap > gapSeconds, 1L).otherwise(0L)
    df.withColumn("session_id",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
