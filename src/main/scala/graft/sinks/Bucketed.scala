package graft.sinks

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout: pre-shuffle fact tables once at write time so
  * every later equi-join/aggregation on the bucket key runs shuffle-free.
  *
  * At 100 TB the dominant cost of the star-schema query surface is the
  * fact-fact / fact-bigdim shuffle; bucketing both sides on the join key
  * (same bucket count) lets Spark plan a sort-merge join with NO
  * Exchange on either side. This is the file-layout analog of the
  * reference's btree-on-yyyymm + PK indexes (sql/schema.sql:17,25,36,51).
  */
object Bucketed {

  /** Write `df` as a bucketed (and optionally month-partitioned) managed
    * table. Joins/aggs on `bucketCols` against tables bucketed the same
    * way are exchange-free.
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    bucketCols: Seq[String],
                    partitionCols: Seq[String] = Nil): Unit = {
    var w = df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
    if (partitionCols.nonEmpty)
      w = w.partitionBy(partitionCols: _*)
    w.format("parquet").saveAsTable(table)
  }
}
