package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.functions.ZOrderKey.{zorderKey, zorderKey3}

/** Multi-dimensional file clustering — `OPTIMIZE ZORDER BY` from plain
  * Spark primitives: compute the Morton key
  * ([[graft.functions.ZOrderKey]]), RANGE-partition on it so each
  * output file owns a contiguous z-range, and sort within partitions so
  * row groups inside a file are tight too.
  *
  * Result: every file's parquet min-max stats are narrow on BOTH
  * dimensions, so predicates on either (or both) prune files — a layout
  * sorted on one column prunes only on that column and scans everything
  * for the other. This is the periodic maintenance companion to
  * [[Compact]]: run it on cold partitions whose query pattern is
  * two-dimensional (e.g. (part, supplier) lookups over lineitem).
  *
  * Cost model at 100 TB: one range-sample pass + one shuffle, same as
  * any global sort — amortized over every future pruned scan.
  */
object ZOrder {

  /** Rewrite `df` at `path` clustered by the z-order of (`dimA`,
    * `dimB`), `numFiles` output files. Dimension values must lie in
    * [0, 2^31) (see [[graft.functions.ZOrderKey.interleave]]).
    */
  def writeClustered(df: DataFrame, path: String, dimA: String, dimB: String,
                     numFiles: Int): Unit = {
    require(numFiles > 0, s"numFiles=$numFiles")
    df.withColumn("__zkey", zorderKey(col(dimA), col(dimB)))
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
      .write.mode("overwrite").parquet(path)
  }

  /** [[writeClustered]] on the Hilbert curve
    * ([[graft.functions.HilbertKey]]) instead of Morton: consecutive
    * keys are spatially ADJACENT (no power-of-two diagonal jumps), so
    * each file's min-max box is tighter and pruning discards more
    * files for the same file count — prefer it for new layouts; Morton
    * stays for parity with z-ordered tables written elsewhere.
    */
  def writeClusteredHilbert(df: DataFrame, path: String, dimA: String,
                            dimB: String, numFiles: Int): Unit = {
    require(numFiles > 0, s"numFiles=$numFiles")
    df.withColumn("__hkey",
        graft.functions.HilbertKey.hilbertKey(col(dimA), col(dimB)))
      .repartitionByRange(numFiles, col("__hkey"))
      .sortWithinPartitions(col("__hkey"))
      .drop("__hkey")
      .write.mode("overwrite").parquet(path)
  }

  /** Three-dimension variant ([[graft.functions.ZOrderKey3]]): values in
    * [0, 2^21) per dimension.
    */
  def writeClustered3(df: DataFrame, path: String, dimA: String, dimB: String,
                      dimC: String, numFiles: Int): Unit = {
    require(numFiles > 0, s"numFiles=$numFiles")
    df.withColumn("__zkey", zorderKey3(col(dimA), col(dimB), col(dimC)))
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
      .write.mode("overwrite").parquet(path)
  }
}
