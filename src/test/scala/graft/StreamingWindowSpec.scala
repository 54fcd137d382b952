package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Event-time windowed aggregation with watermarks (the Structured
  * Streaming surface SURVEY.md §2.7 maps the month-slice idiom onto):
  * tumbling windows keyed on event time, late rows beyond the watermark
  * dropped.
  */
class StreamingWindowSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("tumbling event-time window + watermark aggregates by window") {
    val root = Files.createTempDirectory("sw").toString
    Seq(
      (1L, "2024-01-01 10:01:00", 10.0),
      (2L, "2024-01-01 10:04:00", 5.0),
      (3L, "2024-01-01 10:07:00", 2.0)
    ).toDF("event_id", "ts_s", "value")
      .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"), col("value"))
      .write.parquet(s"$root/in/f1")
    val schema = spark.read.parquet(s"$root/in/f1").schema

    val agg = spark.readStream.schema(schema).parquet(s"$root/in/*")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
      .select(col("window.start").cast("string").as("w"), col("n"), col("v"))

    val q = agg.writeStream
      .format("memory").queryName("win_out")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/chk")
      .start()
    q.awaitTermination()

    val out = spark.sql("SELECT * FROM win_out ORDER BY w")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq(
      ("2024-01-01 10:00:00", 2L, 15.0),
      ("2024-01-01 10:05:00", 1L, 2.0)))
  }
}
