package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.DedupStream

/** Streaming exact dedup: duplicates within the watermark window drop,
  * across batches, with bounded state.
  */
class DedupStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(rows: Seq[(Long, String, String)]) =
    rows.toDF("doc_id", "ts_s", "text")
      .select(col("doc_id"), to_timestamp(col("ts_s")).as("ts"), col("text"))

  test("duplicate fingerprints drop within the watermark, across micro-batch runs") {
    val root = Files.createTempDirectory("dedupstream").toString
    val (in, out, chk) = (s"$root/in", s"$root/out", s"$root/chk")

    // batch 1: two exact dups (normalized: case/whitespace-insensitive)
    // plus one distinct doc
    docs(Seq(
      (1L, "2024-01-01 10:00:00", "the quick brown fox"),
      (2L, "2024-01-01 10:01:00", "The  Quick   Brown Fox"),
      (3L, "2024-01-01 10:02:00", "something else entirely")
    )).write.parquet(s"$in/f1")
    val schema = spark.read.parquet(s"$in/f1").schema

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(s"$in/*")
      val q = DedupStream.dropDupsStream(stream, "text", "ts", "10 minutes")
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", chk)
        .format("parquet").option("path", out)
        .start()
      q.awaitTermination()
    }
    runOnce()
    val r1 = spark.read.parquet(out).select("doc_id").as[Long].collect().sorted
    assert(r1.length === 2) // one of {1,2} plus 3
    assert(r1.contains(3L))

    // batch 2: another copy of the same text, 2 min later (inside the
    // 10-minute watermark window) → dropped via checkpointed state;
    // a genuinely new doc survives
    docs(Seq(
      (4L, "2024-01-01 10:04:00", "the quick brown fox"),
      (5L, "2024-01-01 10:05:00", "brand new content")
    )).write.parquet(s"$in/f2")
    runOnce()
    val r2 = spark.read.parquet(out).select("doc_id").as[Long].collect().sorted
    assert(r2.length === 3)
    assert(r2.contains(5L) && !r2.contains(4L))

    // streaming survivors carry the same fingerprints the batch path
    // would compute — batch and stream agree on "identical"
    val batchFps = graft.llm.Dedup
      .dropExactDups(spark.read.parquet(s"$in/*"), "doc_id", "text")
      .select(graft.llm.TextStats.fingerprint(col("text")).as("f"))
      .as[String].collect().toSet
    val streamFps = spark.read.parquet(out)
      .select("fingerprint").as[String].collect().toSet
    assert(streamFps === batchFps)
  }
}
