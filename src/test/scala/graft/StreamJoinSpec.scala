package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamJoin

/** Stream-stream join bounded in event time: matches inside the window
  * join, outside-window and wrong-key events do not, and the streaming
  * result equals the batch twin of the same predicate.
  */
class StreamJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def frame(rows: Seq[(Long, String, String)], ts: String, v: String) =
    rows.toDF("user_id", "ts_s", v)
      .select(col("user_id"), to_timestamp(col("ts_s")).as(ts), col(v))

  test("events join within the time bound; outside or wrong key never match") {
    val root = Files.createTempDirectory("streamjoin").toString
    val clicks = frame(Seq(
      (1L, "2024-01-01 10:00:00", "c1"),
      (1L, "2024-01-01 12:00:00", "c2"),   // no impression within 10 min
      (2L, "2024-01-01 10:04:00", "c3"),
      (3L, "2024-01-01 10:00:00", "c4")    // user 3 has no impressions
    ), "click_ts", "click")
    val imps = frame(Seq(
      (1L, "2024-01-01 10:05:00", "i1"),   // 5 min after c1 → joins
      (2L, "2024-01-01 09:58:00", "i2"),   // 6 min before c3 → joins
      (4L, "2024-01-01 10:00:00", "i3")    // user 4 has no clicks
    ), "imp_ts", "imp")
    clicks.write.parquet(s"$root/clicks")
    imps.write.parquet(s"$root/imps")

    val cs = spark.readStream.schema(clicks.schema).parquet(s"$root/clicks")
    val is = spark.readStream.schema(imps.schema).parquet(s"$root/imps")
    val q = StreamJoin.joinWithinTime(cs, is, Seq("user_id"),
        "click_ts", "imp_ts", watermarkDelay = "1 hour", bound = "10 minutes")
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/chk")
      .format("parquet").option("path", s"$root/out")
      .start()
    q.awaitTermination()

    val got = spark.read.parquet(s"$root/out")
      .select("click", "imp").as[(String, String)].collect().toSet
    assert(got === Set(("c1", "i1"), ("c3", "i2")))

    // batch twin of the same predicate agrees
    val batch = StreamJoin.joinWithinTime(clicks, imps, Seq("user_id"),
        "click_ts", "imp_ts", watermarkDelay = "1 hour", bound = "10 minutes")
      .select("click", "imp").as[(String, String)].collect().toSet
    assert(batch === got)
  }
}
