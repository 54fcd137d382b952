package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.MonthlySlices

/** Incremental month-slice streaming: late data converges to the batch
  * answer via read-modify-overwrite of exactly the touched partitions.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def events(rows: Seq[(Long, String, Long, Double)]) =
    rows.toDF("event_id", "ts_s", "user_id", "value")
      .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
        col("user_id"), col("value"))

  test("late-arriving month re-merges; other slices untouched") {
    val root = Files.createTempDirectory("stream").toString
    val (in, out, chk) = (s"$root/in", s"$root/out", s"$root/chk")

    // batch 1: two January events for user 1, one February for user 2
    events(Seq(
      (1L, "2024-01-05 10:00:00", 1L, 10.0),
      (2L, "2024-01-20 11:00:00", 1L, 5.0),
      (3L, "2024-02-02 09:00:00", 2L, 7.0)
    )).write.parquet(s"$in/f1")
    val schema = spark.read.parquet(s"$in/f1").schema
    val q1 = MonthlySlices.run(
      MonthlySlices.eventStream(spark, s"$in/*", schema), out, chk)
    q1.awaitTermination()
    assert(spark.read.parquet(out).count() === 2)
    val jan1 = spark.read.parquet(out).where($"yyyymm" === 202401).collect()(0)
    assert(jan1.getAs[Long]("n_events") === 2L && jan1.getAs[Double]("value_sum") === 15.0)

    // batch 2: a LATE January event — only the January slice re-merges
    events(Seq((4L, "2024-01-28 23:00:00", 1L, 2.5)))
      .write.parquet(s"$in/f2")
    val q2 = MonthlySlices.run(
      MonthlySlices.eventStream(spark, s"$in/*", schema), out, chk)
    q2.awaitTermination()
    val jan2 = spark.read.parquet(out).where($"yyyymm" === 202401).collect()(0)
    assert(jan2.getAs[Long]("n_events") === 3L && jan2.getAs[Double]("value_sum") === 17.5)
    val feb = spark.read.parquet(out).where($"yyyymm" === 202402).collect()(0)
    assert(feb.getAs[Long]("n_events") === 1L && feb.getAs[Double]("value_sum") === 7.0)

    // convergence: streaming end-state == batch recompute over all input
    val batchAnswer = MonthlySlices.stageBatch(spark.read.parquet(s"$in/*"))
      .orderBy("user_id").collect().map(_.toSeq).toSeq
    val streamAnswer = spark.read.parquet(out)
      .select("user_id", "yyyymm", "n_events", "value_sum")
      .orderBy("user_id").collect().map(_.toSeq).toSeq
    assert(streamAnswer === batchAnswer)
  }

  test("stream-static enrichment: dimension join inside the micro-batch pipeline") {
    val root = Files.createTempDirectory("streamdim").toString
    events(Seq(
      (1L, "2024-01-05 10:00:00", 1L, 10.0),
      (2L, "2024-01-06 10:00:00", 2L, 5.0),
      (3L, "2024-01-07 10:00:00", 9L, 1.0) // no dim row → dropped by inner join
    )).write.parquet(s"$root/in/f1")
    val schema = spark.read.parquet(s"$root/in/f1").schema
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")

    // static side broadcasts into every micro-batch — no stream-side
    // state, the standard enrichment shape
    val q = spark.readStream.schema(schema).parquet(s"$root/in/*")
      .join(broadcast(dim), Seq("user_id"))
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/chk")
      .format("parquet").option("path", s"$root/out")
      .start()
    q.awaitTermination()
    val got = spark.read.parquet(s"$root/out")
      .select("event_id", "tier").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got === Seq((1L, "gold"), (2L, "basic")).sortBy(_._1))
  }
}
