package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Copy-on-write MERGE (CDC upsert) into a partitioned parquet layout —
  * the file-warehouse twin of [[Upsert]]/[[Jdbc]]'s `ON CONFLICT`
  * (reference: model_curated.py:72-101), and the write path every
  * lakehouse table format wraps in metadata.
  *
  * Scale discipline:
  *  - only partitions PRESENT in the incoming batch are read and
  *    rewritten (partition pruning on the read, dynamic overwrite on
  *    the write via [[Idempotent.writeMonthSlice]]) — a CDC batch
  *    touching 3 of 10,000 month-partitions costs 3 partitions;
  *  - the merged slice is `localCheckpoint`ed before the overwrite so
  *    the write never races its own scan of the files it replaces;
  *  - incoming duplicates resolve deterministically: highest
  *    `versionCol` per key wins, ties broken by the key ordering.
  */
object Merge {

  /** Merge `incoming` into the layout at `path`: within the incoming
    * batch's partitions, incoming rows replace existing rows with the
    * same `keyCols`; untouched partitions survive byte-for-byte. First
    * write (no sink yet) degrades to a plain partitioned write.
    *
    * PRECONDITION — partition-stable keys: `keyCols → partitionCol`
    * must be a stable mapping across versions of a key. The partition
    * pruning that makes this merge cheap is also its blind spot: if a
    * key's partition value CHANGES between batches (row moves from P1
    * to P2) and P1 is not in the incoming batch, the stale P1 copy is
    * never read, never anti-joined, and survives — the layout then
    * holds the key twice. Typical safe designs derive `partitionCol`
    * from the key (hash bucket) or from an immutable attribute
    * (creation month). If the mapping can drift, run with
    * `validateStableKeys = true`, which scans the UNTOUCHED partitions
    * for incoming keys and fails loudly — a full-layout key scan, so
    * it is opt-in, not the default, at 100 TB.
    *
    * @param versionCol monotonically increasing change version (CDC
    *        LSN, updated_at); the highest version per key wins within
    *        the incoming batch
    * @param validateStableKeys scan partitions OUTSIDE the batch for
    *        the batch's keys and throw if any key would be duplicated
    *        by a partition move (cost: one semi-join over the rest of
    *        the layout)
    */
  def upsertPartitions(spark: SparkSession, incoming: DataFrame, path: String,
                       partitionCol: String, keyCols: Seq[String],
                       versionCol: String,
                       validateStableKeys: Boolean = false): Unit = {
    require(keyCols.nonEmpty, "need at least one key column")
    // latest-per-key within the batch (CDC feeds repeat keys)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc)
    val latest = incoming.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
    // a null partition value would read back as isin(null) = never-match:
    // existing rows of the null partition wouldn't be carried into the
    // rewrite and the dynamic overwrite would drop them — refuse loudly
    require(latest.where(col(partitionCol).isNull).isEmpty,
      s"incoming batch has rows with null $partitionCol — route them to a " +
        "sentinel partition value before merging")
    val merged =
      if (!Idempotent.pathExists(spark, path)) latest
      else {
        // bounded driver-side list: partition VALUES of one batch
        val parts = latest.select(col(partitionCol)).distinct()
          .collect().map(_.get(0))
        if (validateStableKeys) {
          val moved = spark.read.parquet(path)
            .where(!col(partitionCol).isin(parts: _*))
            .join(latest.select(keyCols.map(col): _*), keyCols, "left_semi")
            .select((col(partitionCol) +: keyCols.map(col)): _*)
            .limit(5).collect()
          require(moved.isEmpty,
            s"incoming keys already live in partitions outside this batch " +
              s"(partition moved; the stale copy would survive): " +
              moved.map(_.toString).mkString(", "))
        }
        val existing = spark.read.parquet(path)
          .where(col(partitionCol).isin(parts: _*))
        existing.join(latest.select(keyCols.map(col): _*),
            keyCols, "left_anti")
          .unionByName(latest)
      }
    // materialize before overwriting the files the plan reads
    Idempotent.writeMonthSlice(merged.localCheckpoint(true), path, partitionCol)
  }

  /** Streaming CDC: apply each micro-batch as one [[upsertPartitions]]
    * merge — `readStream` on the change feed, `foreachBatch` here, and
    * the parquet layout stays an upserted table. Checkpointing makes a
    * replayed batch re-merge the same rows, and [[upsertPartitions]] is
    * idempotent for them (same keys, same versions → same survivors) —
    * the exactly-once-effective pattern for file-layout CDC.
    */
  def upsertStream(changes: DataFrame, path: String, partitionCol: String,
                   keyCols: Seq[String], versionCol: String,
                   checkpointDir: String,
                   trigger: org.apache.spark.sql.streaming.Trigger =
                     org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsertPartitions(batch.sparkSession, batch, path,
          partitionCol, keyCols, versionCol)
      }
      .start()
}
