package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sinks.Idempotent

/** Cross-batch exact deduplication against a persistent fingerprint
  * index — the continuous-ingestion form of [[Dedup.dropExactDups]]: a
  * corpus arrives as a stream of batches (daily crawls, source drops),
  * and each batch must dedup against EVERYTHING already ingested, not
  * just against itself. Re-scanning the accumulated corpus per batch is
  * O(corpus) per day; the index holds only the 32-hex-char normalized
  * fingerprints, so the per-batch cost is one batch-side fingerprint
  * pass plus one anti-join at fingerprint grain against a table ~1% the
  * corpus bytes.
  *
  * Index layout: parquet `(fingerprint)` partitioned by `batch_id`,
  * written with dynamic partition overwrite — replaying a batch
  * replaces exactly its own partition, so re-runs are idempotent (the
  * reference's delete-slice-then-append contract, `sinks/Idempotent`).
  * The anti-join reads the index EXCLUDING the current batch's
  * partition (partition-pruned), which is what makes the re-run see the
  * same prior state as the first run.
  */
object IncrementalDedup {

  /** Dedup `batch` against the index at `indexPath` and against itself
    * (min-id survivor within the batch), then record the survivors'
    * fingerprints under `batch_id = batchId`. Returns the surviving
    * rows. Survivors-only indexing keeps the index at one row per
    * distinct fingerprint ever ingested.
    */
  def ingestBatch(spark: SparkSession, batch: DataFrame, idCol: String,
                  textCol: String, indexPath: String, batchId: Long)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fp = TextStats.fingerprint(col(textCol))
    // within-batch: deterministic min-id survivor per fingerprint
    val w = Window.partitionBy(col("__fp")).orderBy(col(idCol))
    val inBatch = batch.withColumn("__fp", fp)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
    // cross-batch: anti-join against every OTHER batch's fingerprints.
    // The batch_id filter prunes the current partition at the scan, so a
    // replayed batch never sees its own previous fingerprints.
    val survivors =
      if (Idempotent.pathExists(spark, indexPath)) {
        val prior = spark.read.parquet(indexPath)
          .where(col("batch_id") =!= batchId)
          .select(col("fingerprint").as("__fp"))
        inBatch.join(prior, Seq("__fp"), "left_anti")
      } else inBatch
    // localCheckpoint: the survivor set is both returned AND written to
    // the index; without materialization the index write would re-run
    // the anti-join with the index as its own input mid-overwrite
    val pinned = survivors.localCheckpoint(true)
    Idempotent.writeMonthSlice(
      pinned.select(col("__fp").as("fingerprint"),
        lit(batchId).as("batch_id")),
      indexPath, partitionCol = "batch_id")
    pinned.drop("__fp")
  }
}
