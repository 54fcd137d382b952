package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.ops.Casts
import graft.sinks.Idempotent

/** Structured-Streaming extension of the reference's incrementality model.
  *
  * The reference has no streaming engine — "late data is handled by
  * re-running the month", made safe by delete-slice-then-append
  * idempotency (SURVEY.md §2.7; reference transform_operator.py:16-31).
  * The Spark-native generalization keeps exactly that contract:
  *
  *   readStream → stage/normalize → foreachBatch:
  *     dedupe-agg the batch to (key, yyyymm) grain and dynamic-partition
  *     OVERWRITE the affected month slices.
  *
  * Each micro-batch replaces only the months it touches ([[Idempotent]]'s
  * partition overwrite), so replays and late arrivals converge to the
  * same state as a batch re-run of those months — the streaming and batch
  * paths share the same transform functions and the same sink semantics.
  */
object MonthlySlices {

  /** File-source stream of event rows (schema must be supplied for
    * streaming file sources).
    */
  def eventStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** Stage events to (user_id, yyyymm) grain — the streaming twin of the
    * batch `staging_events_monthly` transform; pure, so it can be applied
    * to a static frame in tests and inside foreachBatch identically.
    */
  def stageBatch(events: DataFrame): DataFrame =
    events
      .withColumn("yyyymm", Casts.yyyymmOfTs(col("ts")))
      .groupBy(col("user_id"), col("yyyymm"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value")).as("value_sum"))

  /** Run the incremental monthly pipeline: every micro-batch re-stages
    * the months present in the batch and overwrites exactly those month
    * partitions at `outPath`.
    *
    * For a true end-state merge across batches the overwrite must see the
    * whole month; the month's prior rows are unioned in from the sink
    * before re-aggregation (read-modify-overwrite per slice — the same
    * re-run-the-month semantics as the reference, done incrementally).
    */
  def run(stream: DataFrame, outPath: String, checkpoint: String,
          trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val months = batch
          .select(Casts.yyyymmOfTs(col("ts")).as("yyyymm"))
          .distinct().collect().map(_.getInt(0))
        if (months.nonEmpty) {
          // localCheckpoint materializes the prior slice so the dynamic
          // partition overwrite below isn't writing a path it still reads.
          // First-batch detection is an explicit existence probe: a read
          // error on an EXISTING sink must fail the batch (catching it
          // would re-aggregate without the prior rows and overwrite the
          // month slices with partial state).
          val prior =
            if (Idempotent.pathExists(spark, outPath))
              spark.read.parquet(outPath)
                .where(col("yyyymm").isin(months.toSeq: _*))
                .select(col("user_id"), col("yyyymm"), col("n_events"), col("value_sum"))
                .localCheckpoint(true)
            else null // first batch: no sink yet
          val staged = stageBatch(batch.where(
            Casts.yyyymmOfTs(col("ts")).isin(months.toSeq: _*)))
          val merged =
            if (prior == null) staged
            else staged.unionByName(prior)
              .groupBy(col("user_id"), col("yyyymm"))
              .agg(
                sum(col("n_events")).as("n_events"),
                sum(col("value_sum")).as("value_sum"))
          Idempotent.writeMonthSlice(merged, outPath)
        }
      }
      .start()
}
