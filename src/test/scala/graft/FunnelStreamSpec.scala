package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.FunnelStream

/** Streaming funnel with custom state: events advance the funnel only
  * after the watermark settles them (out-of-order safe), step reaches
  * match the batch twin ([[graft.ops.Funnel]]) exactly, and completed
  * entities drop their state.
  */
class FunnelStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def events(rows: Seq[(Long, String, String)]) =
    rows.toDF("user_id", "ts_s", "typ")
      .select(col("user_id"), to_timestamp(col("ts_s")).as("ts"), col("typ"))

  test("streaming step reaches settle after the watermark and match batch") {
    val root = Files.createTempDirectory("funnelstream").toString
    val (in, out, chk) = (s"$root/in", s"$root/out", s"$root/chk")
    val steps = Seq("view", "click", "purchase")

    val batch1 = Seq(
      // user 1 written OUT OF ORDER: settlement must re-sort
      (1L, "2024-01-01 10:00:30", "click"),
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:01:00", "purchase"),
      // user 2: purchase/click BEFORE the first view never count;
      // the click after the view does
      (2L, "2024-01-01 10:00:00", "purchase"),
      (2L, "2024-01-01 10:00:05", "click"),
      (2L, "2024-01-01 10:00:10", "view"),
      (2L, "2024-01-01 10:00:20", "click"))
    events(batch1).write.parquet(s"$in/f1")
    val schema = spark.read.parquet(s"$in/f1").schema

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(s"$in/*")
      val q = FunnelStream.stepReaches(stream, "user_id", "ts", "typ",
          steps, watermarkDelay = "30 seconds")
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", chk)
        .format("parquet").option("path", out)
        .start()
      q.awaitTermination()
    }

    runOnce() // watermark at epoch: nothing settles yet
    // sentinel pushes the global watermark past every batch-1 event
    events(Seq((99L, "2024-01-01 11:00:00", "view"))).write.parquet(s"$in/f2")
    runOnce()
    events(Seq((99L, "2024-01-01 12:00:00", "view"))).write.parquet(s"$in/f3")
    runOnce() // event-time timeout settles pending events without new data

    val got = spark.read.parquet(out).where(col("entity") < 99)
      .select(col("entity"), col("step"), col("step_type"),
        col("reached_at").cast("string"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3)))
      .toSet
    assert(got === Set(
      (1L, 1, "view", "2024-01-01 10:00:00"),
      (1L, 2, "click", "2024-01-01 10:00:30"),
      (1L, 3, "purchase", "2024-01-01 10:01:00"),
      (2L, 1, "view", "2024-01-01 10:00:10"),
      (2L, 2, "click", "2024-01-01 10:00:20")))

    // a post-completion event must NOT restart user 1's funnel: the
    // completion marker survives in state
    events(Seq((1L, "2024-01-01 10:30:00", "view"))).write.parquet(s"$in/f4")
    runOnce()
    events(Seq((99L, "2024-01-01 13:00:00", "view"))).write.parquet(s"$in/f5")
    runOnce() // settles the post-completion view
    val afterReplay = spark.read.parquet(out).where(col("entity") === 1L)
      .count()
    assert(afterReplay === 3L) // still exactly one reach per step

    // batch-twin parity: same reach times from ops.Funnel.stepTimes
    val batchTimes = graft.ops.Funnel.stepTimes(events(batch1),
        "user_id", "ts", "typ", steps)
      .select(col("user_id"), col("t_1").cast("string"),
        col("t_2").cast("string"), col("t_3").cast("string"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.getString(3)))).toSet
    assert(batchTimes === Set(
      (1L, "2024-01-01 10:00:00", "2024-01-01 10:00:30",
        Some("2024-01-01 10:01:00")),
      (2L, "2024-01-01 10:00:10", "2024-01-01 10:00:20", None)))
  }

  test("simultaneous next-step events are excluded by the strict ordering") {
    val root = Files.createTempDirectory("funnelstream2").toString
    val (in, out, chk) = (s"$root/in", s"$root/out", s"$root/chk")
    events(Seq(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:00:00", "click"))) // same instant: not after
      .write.parquet(s"$in/f1")
    val schema = spark.read.parquet(s"$in/f1").schema
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(s"$in/*")
      val q = FunnelStream.stepReaches(stream, "user_id", "ts", "typ",
          Seq("view", "click"), watermarkDelay = "10 seconds")
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", chk)
        .format("parquet").option("path", out)
        .start()
      q.awaitTermination()
    }
    runOnce()
    events(Seq((99L, "2024-01-01 11:00:00", "view"))).write.parquet(s"$in/f2")
    runOnce()
    events(Seq((99L, "2024-01-01 12:00:00", "view"))).write.parquet(s"$in/f3")
    runOnce()
    val got = spark.read.parquet(out).where(col("entity") < 99)
      .select("step").as[Int].collect().toSeq
    assert(got === Seq(1)) // view reached; the simultaneous click is not
  }
}
