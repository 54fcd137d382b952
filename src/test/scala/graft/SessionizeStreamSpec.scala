package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.SessionizeStream

/** Custom-state streaming sessionization: gap sessions close on
  * event-time timeout, out-of-order events merge, and the closed
  * sessions match the batch twin (`Windows.sessionize`) exactly.
  */
class SessionizeStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def events(rows: Seq[(Long, String)]) =
    rows.toDF("user_id", "ts_s")
      .select(col("user_id"), to_timestamp(col("ts_s")).as("ts"))

  test("sessions close via watermark + event-time timeout; parity with batch sessionize") {
    val root = Files.createTempDirectory("sessionstream").toString
    val (in, out, chk) = (s"$root/in", s"$root/out", s"$root/chk")

    // batch 1 — user 1: two events 30 s apart (one session; written
    // OUT OF ORDER to prove in-batch merge), then one 4.5 min later
    // (second session); user 2: a single event
    events(Seq(
      (1L, "2024-01-01 10:00:30"), // out of order: later event first
      (1L, "2024-01-01 10:00:00"),
      (1L, "2024-01-01 10:05:00"),
      (2L, "2024-01-01 10:00:00")
    )).write.parquet(s"$in/f1")
    val schema = spark.read.parquet(s"$in/f1").schema

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(s"$in/*")
      val q = SessionizeStream.sessions(stream, "user_id", "ts",
          gapSeconds = 60, watermarkDelay = "30 seconds")
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", chk)
        .format("parquet").option("path", out)
        .start()
      q.awaitTermination()
    }

    runOnce() // watermark still at epoch during the batch: nothing closes
    // sentinel user far in the future pushes the GLOBAL watermark past
    // every earlier session's end + gap
    events(Seq((99L, "2024-01-01 11:00:00"))).write.parquet(s"$in/f2")
    runOnce()
    events(Seq((99L, "2024-01-01 12:00:00"))).write.parquet(s"$in/f3")
    runOnce() // event-time timeout closes sessions with no new events

    val got = spark.read.parquet(out)
      .where(col("user_id") < 99)
      .select(col("user_id"), col("session_start").cast("string"),
        col("session_end").cast("string"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(got === Set(
      (1L, "2024-01-01 10:00:00", "2024-01-01 10:00:30", 2L),
      (1L, "2024-01-01 10:05:00", "2024-01-01 10:05:00", 1L),
      (2L, "2024-01-01 10:00:00", "2024-01-01 10:00:00", 1L)))

    // exact parity with the batch twin on the same (non-sentinel) events
    val static = events(Seq(
      (1L, "2024-01-01 10:00:30"), (1L, "2024-01-01 10:00:00"),
      (1L, "2024-01-01 10:05:00"), (2L, "2024-01-01 10:00:00")))
    val batchTwin = graft.ops.Windows.sessionize(static, "user_id", "ts",
        Seq(col("ts")), gapSeconds = 60)
      .groupBy("user_id", "session_id")
      .agg(min(col("ts")).cast("string").as("s"),
        max(col("ts")).cast("string").as("e"),
        count(lit(1)).as("n"))
      .select("user_id", "s", "e", "n")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(got === batchTwin)
  }

  test("late events beyond the watermark are dropped, within it they merge") {
    val root = Files.createTempDirectory("sessionstream2").toString
    val (in, out, chk) = (s"$root/in", s"$root/out", s"$root/chk")
    events(Seq((5L, "2024-01-01 10:00:00"), (5L, "2024-01-01 10:00:20")))
      .write.parquet(s"$in/f1")
    val schema = spark.read.parquet(s"$in/f1").schema
    def runOnce(): Unit = {
      val q = SessionizeStream.sessions(
          spark.readStream.schema(schema).parquet(s"$in/*"), "user_id", "ts",
          gapSeconds = 60, watermarkDelay = "10 minutes")
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", chk)
        .format("parquet").option("path", out)
        .start()
      q.awaitTermination()
    }
    runOnce()
    // 40 s after the last event, still inside the 10-minute watermark
    // delay: merges into the open session despite arriving a batch later
    events(Seq((5L, "2024-01-01 10:01:00"))).write.parquet(s"$in/f2")
    runOnce()
    events(Seq((99L, "2024-01-01 13:00:00"))).write.parquet(s"$in/f3")
    runOnce()
    events(Seq((99L, "2024-01-01 16:00:00"))).write.parquet(s"$in/f4")
    runOnce()
    val got = spark.read.parquet(out).where(col("user_id") === 5L)
      .select(col("session_start").cast("string"),
        col("session_end").cast("string"), col("n_events"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(("2024-01-01 10:00:00", "2024-01-01 10:01:00", 3L)))
  }
}
