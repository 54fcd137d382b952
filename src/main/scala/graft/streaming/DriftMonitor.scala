package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Ingest-time distribution monitoring: score every micro-batch's value
  * distribution against a static reference with the PSI ([[graft.ops
  * .Drift.psi]]) and append one metrics row per batch — the streaming
  * form of the batch-over-batch health check, catching a drifting
  * upstream BEFORE a poisoned day of data lands in the corpus (the
  * failure mode batch DQ only sees the morning after).
  *
  * Scale shape per batch: the reference side is bucketed ONCE by the
  * caller (pass a persisted frame); the batch side is one bucket-grain
  * aggregate over the micro-batch; the metrics row is a single append.
  * State never accumulates in the query — the monitor is stateless
  * across batches by design (each batch scores independently), so no
  * watermark bookkeeping and no state-store growth.
  */
object DriftMonitor {

  /** A `foreachBatch` writer appending per-batch rows
    * `(batch_id, n_buckets, n_a, n_b, psi, drifted)` as parquet under
    * `metricsPath`. `reference` should be persisted by the caller (it
    * is re-read every batch). Batches with no rows still append (psi
    * computed against the empty side — the smoothing keeps it finite),
    * so silence upstream is visible too.
    */
  def psiWriter(stream: DataFrame, reference: DataFrame, value: String,
                bucketWidth: Long, metricsPath: String,
                alertThreshold: Double = 0.25): DataStreamWriter[Row] = {
    require(alertThreshold > 0, s"alertThreshold=$alertThreshold")
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      graft.ops.Drift.psi(reference, batch, col(value), bucketWidth)
        .withColumn("batch_id", lit(id))
        .withColumn("drifted", col("psi") > lit(alertThreshold))
        .select(col("batch_id"), col("n_buckets"), col("n_a"), col("n_b"),
          col("psi"), col("drifted"))
        .coalesce(1)
        .write.mode("append").parquet(metricsPath)
      ()
    }
  }
}
