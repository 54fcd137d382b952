package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Column profiling — the table-level DQ summary every ETL run logs
  * before gating (extends the reference's per-rule gates,
  * dq_non_negative / dq_uniques, with the standard profile sweep).
  *
  * ONE aggregation pass computes every column's metrics simultaneously
  * (a per-column loop would re-scan the table per column — the classic
  * profiling mistake at warehouse scale); the single wide result row is
  * then unpivoted driver-side into (column, metric...) rows — bounded by
  * the column count, not the data.
  */
object Profile {

  /** @return one row per profiled column:
    *         (column, n_rows, n_nulls, n_distinct) — `n_distinct` is the
    *         exact distinct count of non-null values.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "no columns to profile")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        count_distinct(col(c)).as(s"__distinct_$c"))
    } :+ count(lit(1)).as("__rows")
    val row: Row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val out = cols.map { c =>
      (c, row.getAs[Long]("__rows"), row.getAs[Long](s"__nulls_$c"),
        row.getAs[Long](s"__distinct_$c"))
    }
    df.sparkSession.createDataFrame(out)
      .toDF("column", "n_rows", "n_nulls", "n_distinct")
  }
}
