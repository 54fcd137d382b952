package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.DriftMonitor

/** Streaming PSI monitor: an in-distribution batch scores low, a
  * shifted batch trips the alert, one metrics row lands per batch, and
  * the per-batch scores equal the batch Drift.psi on the same slices.
  */
class DriftMonitorSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("per-batch PSI rows: in-distribution quiet, shifted batch alerts") {
    val root = Files.createTempDirectory("driftmon").toString
    // reference: uniform 0..999 (buckets 0..9 under width 100)
    val reference = (0 until 1000).map(_.toLong).toDF("v").persist()

    // batch f1 draws from the same range; batch f2 is shifted by +5000
    val f1 = (0 until 500).map(i => (i * 2).toLong)
    val f2 = (0 until 500).map(i => (5000 + i * 2).toLong)
    f1.toDF("v").coalesce(1).write.parquet(s"$root/in/f1")
    val schema = spark.read.parquet(s"$root/in/f1").schema

    def runOnce(): Unit = {
      val q = DriftMonitor.psiWriter(
          spark.readStream.schema(schema).parquet(s"$root/in/*"),
          reference, "v", bucketWidth = 100L,
          metricsPath = s"$root/metrics", alertThreshold = 0.25)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/chk") // shared: run 2 resumes
        .start()
      q.awaitTermination()
    }
    runOnce()
    f2.toDF("v").coalesce(1).write.parquet(s"$root/in/f2")
    runOnce() // resumes from the checkpointed offset: scores f2 only

    val m = spark.read.parquet(s"$root/metrics")
      .orderBy("batch_id").collect()
      .map(r => (r.getLong(3), r.getDouble(4), r.getBoolean(5)))
    assert(m.length === 2, s"expected one metrics row per batch: ${m.toSeq}")
    val Array((nb1, psi1, drift1), (nb2, psi2, drift2)) = m
    assert(nb1 === 500L && nb2 === 500L)
    assert(!drift1 && psi1 < 0.1, s"in-distribution batch scored $psi1")
    assert(drift2 && psi2 > 1.0, s"shifted batch scored $psi2")

    // the streaming score IS the batch operator's score on the same slice
    val expected2 = graft.ops.Drift.psi(reference, f2.toDF("v"), col("v"), 100L)
      .select("psi").as[Double].head()
    assert(psi2 === expected2)
    reference.unpersist()
  }
}
