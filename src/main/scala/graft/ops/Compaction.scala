package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planning — the table-maintenance pass every
  * long-lived 100 TB lake needs: streaming ingest and per-month
  * overwrites leave thousands of KB-scale files per partition, and
  * scan throughput dies on open() overhead long before bytes matter.
  * The planner turns a file inventory (partition, file, bytes) into a
  * deterministic assignment file → output bin, each bin targeting
  * `targetBytes`.
  *
  * Assignment is SEQUENTIAL CUMULATIVE BINNING: within a partition,
  * order files by (bytes desc, file asc) and cut bins at
  * `floor(running_bytes_before / targetBytes)` — the order real
  * compactors (Iceberg/Delta bin-packing) use, made deterministic by
  * the total tiebreak. Every bin lands in [targetBytes, targetBytes +
  * largest-remaining-file) except the last, which holds the tail; a
  * file larger than `targetBytes` gets a bin of its own (its running
  * cut spans a whole stride). One window per PARTITION (the planning
  * grain — thousands of files, not rows), never a global sort.
  */
object Compaction {

  /** Per-file bin assignment.
    * @param inventory (partCol, fileCol, bytesCol) file listing
    * @return inventory columns + `bin` (0-based within partition)
    */
  def plan(inventory: DataFrame, partCol: String, fileCol: String,
           bytesCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes=$targetBytes")
    val w = Window.partitionBy(col(partCol))
      .orderBy(col(bytesCol).desc, col(fileCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    inventory
      .withColumn("__before", coalesce(sum(col(bytesCol)).over(w), lit(0L)))
      .withColumn("bin", expr(s"__before div ${targetBytes}L"))
      .drop("__before")
  }

  /** Bin-grain summary of [[plan]] — what the compactor actually
    * executes: per (partition, bin) the file count and byte total,
    * plus the partition's before/after file counts. The DQ gate on a
    * compaction run: n_bins ≪ n_files and no bin lost bytes.
    */
  def planSummary(inventory: DataFrame, partCol: String, fileCol: String,
                  bytesCol: String, targetBytes: Long): DataFrame =
    plan(inventory, partCol, fileCol, bytesCol, targetBytes)
      .groupBy(col(partCol), col("bin"))
      .agg(count(lit(1)).as("n_files"), sum(col(bytesCol)).as("bytes"))

  /** ANSI-SQL twin of [[planSummary]]; `inventorySql` must yield
    * (part, file, bytes). Keep in lockstep.
    */
  def planSummarySql(inventorySql: String, targetBytes: Long): String =
    s"""WITH inv AS ($inventorySql),
       |cut AS (
       |  SELECT part, file, bytes,
       |         COALESCE(sum(bytes) OVER (
       |           PARTITION BY part ORDER BY bytes DESC, file
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |           // $targetBytes AS bin
       |  FROM inv
       |)
       |SELECT part, CAST(bin AS BIGINT) AS bin,
       |       CAST(count(*) AS BIGINT) AS n_files,
       |       CAST(sum(bytes) AS BIGINT) AS bytes
       |FROM cut GROUP BY 1, 2 ORDER BY part, bin""".stripMargin
}
