package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Idempotent month-slice writes (S7).
  *
  * The reference re-runs a month safely by `DELETE FROM t WHERE yyyymm = n`
  * before every JDBC append (transform_operator.py:16-31 and twins) —
  * out-of-band psycopg2 because Spark's JDBC sink can't delete. The
  * Spark-native equivalent for file/lakehouse sinks is dynamic partition
  * overwrite on a month-partitioned layout: only the partitions present in
  * the incoming frame are replaced, so re-running a month is a no-op
  * delete+insert of exactly that slice — and at 100 TB the layout doubles
  * as the partition-pruning index the reference built with a btree on
  * yyyymm (sql/schema.sql:17,25).
  */
object Idempotent {

  /** Overwrite exactly the month partitions present in `df` at `path`.
    * Requires a `yyyymm` column; other months already at `path` survive.
    */
  def writeMonthSlice(df: DataFrame, path: String,
                      partitionCol: String = "yyyymm"): Unit =
    df.write
      .mode("overwrite")
      // per-write option overrides spark.sql.sources.partitionOverwriteMode
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(path)

  /** Explicit sink-existence probe (Hadoop FileSystem, so it works on any
    * supported storage scheme, not just local paths). "Read failed" and
    * "sink doesn't exist yet" are different conditions: first-load /
    * first-batch branches must key off THIS, and let read errors on an
    * existing sink propagate instead of silently discarding prior state.
    */
  def pathExists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}
