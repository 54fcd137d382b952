package graft.sinks

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Small-file compaction for partitioned layouts.
  *
  * Month-sliced streaming/incremental writes (one file per micro-batch
  * per partition) accumulate small files that poison scan parallelism
  * and NameNode/listing costs at scale. Compaction rewrites each
  * partition's rows clustered by the partition key, producing one file
  * per partition value per shuffle task — the periodic maintenance job
  * every 100 TB layout runs.
  */
object Compact {

  /** Rewrite `path`'s partitions so each partition value lands in a
    * single file (hash-clustered repartition + dynamic overwrite).
    * Only partitions present in the data are touched.
    */
  def compact(spark: SparkSession, path: String, partitionCol: String): Unit = {
    // localCheckpoint materializes the input so the overwrite below does
    // not race its own scan.
    val data = spark.read.parquet(path)
      .repartition(col(partitionCol))
      .localCheckpoint(true)
    Idempotent.writeMonthSlice(data, path, partitionCol)
  }
}
