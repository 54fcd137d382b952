package graft

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{DedupStream, SessionizeStream, StateBackend, StreamJoin}

/** The stateful streaming operators run unchanged on the RocksDB state
  * store provider — the backend that keeps state off-heap/on-disk and is
  * the only viable one when state ≫ executor RAM (see
  * [[graft.streaming.StateBackend]] for the full rationale). Each test
  * re-runs an operator already proven on the default on-heap backend and
  * asserts (a) identical results and (b) that RocksDB actually ran —
  * changelog files in the checkpoint are written ONLY by the RocksDB
  * provider with changelog checkpointing on.
  */
class RocksDbStateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** .changelog files appear iff RocksDBStateStoreProvider committed. */
  private def changelogCount(chk: String): Long = {
    val state = Paths.get(chk, "state")
    if (!Files.exists(state)) 0L
    else {
      val s = Files.walk(state)
      try s.filter(p => p.toString.endsWith(".changelog")).count()
      finally s.close()
    }
  }

  private def events(rows: Seq[(Long, String)]) =
    rows.toDF("user_id", "ts_s")
      .select(col("user_id"), to_timestamp(col("ts_s")).as("ts"))

  test("sessionize: RocksDB backend matches the on-heap result and writes changelogs") {
    val root = Files.createTempDirectory("rocks-sess").toString
    val (in, out, chk) = (s"$root/in", s"$root/out", s"$root/chk")
    events(Seq(
      (1L, "2024-01-01 10:00:30"), (1L, "2024-01-01 10:00:00"),
      (1L, "2024-01-01 10:05:00"), (2L, "2024-01-01 10:00:00")
    )).write.parquet(s"$in/f1")
    val schema = spark.read.parquet(s"$in/f1").schema

    def runOnce(): Unit = StateBackend.withRocksDb(spark) {
      val q = SessionizeStream.sessions(
          spark.readStream.schema(schema).parquet(s"$in/*"), "user_id", "ts",
          gapSeconds = 60, watermarkDelay = "30 seconds")
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", chk)
        .format("parquet").option("path", out).start()
      q.awaitTermination()
    }
    runOnce()
    events(Seq((99L, "2024-01-01 11:00:00"))).write.parquet(s"$in/f2")
    runOnce()
    events(Seq((99L, "2024-01-01 12:00:00"))).write.parquet(s"$in/f3")
    runOnce()

    val got = spark.read.parquet(out).where(col("user_id") < 99)
      .select(col("user_id"), col("session_start").cast("string"),
        col("session_end").cast("string"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    // same closed sessions the on-heap backend produces (SessionizeStreamSpec)
    assert(got === Set(
      (1L, "2024-01-01 10:00:00", "2024-01-01 10:00:30", 2L),
      (1L, "2024-01-01 10:05:00", "2024-01-01 10:05:00", 1L),
      (2L, "2024-01-01 10:00:00", "2024-01-01 10:00:00", 1L)))
    assert(changelogCount(chk) > 0, "RocksDB changelog checkpointing did not run")
  }

  test("streaming dedup: RocksDB backend drops the same duplicates") {
    val root = Files.createTempDirectory("rocks-dedup").toString
    val (in, out, chk) = (s"$root/in", s"$root/out", s"$root/chk")
    Seq(
      (1L, "same text", "2024-01-01 10:00:00"),
      (2L, "same text", "2024-01-01 10:00:05"),
      (3L, "other text", "2024-01-01 10:00:10")
    ).toDF("doc_id", "text", "ts_s")
      .select(col("doc_id"), col("text"), to_timestamp(col("ts_s")).as("ts"))
      .write.parquet(s"$in/f1")
    val schema = spark.read.parquet(s"$in/f1").schema

    StateBackend.withRocksDb(spark, boundedMemoryMB = 256) {
      val q = DedupStream.dropDupsStream(
          spark.readStream.schema(schema).parquet(s"$in/*"),
          "text", "ts", watermarkDelay = "10 minutes")
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", chk)
        .format("parquet").option("path", out).start()
      q.awaitTermination()
    }
    val survivors = spark.read.parquet(out).select("doc_id")
      .as[Long].collect().toSet
    assert(survivors.contains(3L))
    assert(survivors.intersect(Set(1L, 2L)).size === 1,
      s"exactly one of the identical docs should survive, got $survivors")
    assert(changelogCount(chk) > 0)
  }

  test("stream-stream time-bounded join: RocksDB backend matches") {
    val root = Files.createTempDirectory("rocks-join").toString
    val (inL, inR, out, chk) = (s"$root/l", s"$root/r", s"$root/out", s"$root/chk")
    Seq((1L, "2024-01-01 10:00:00"), (2L, "2024-01-01 10:00:00"))
      .toDF("k", "lts_s")
      .select(col("k"), to_timestamp(col("lts_s")).as("lts"))
      .write.parquet(s"$inL/f1")
    Seq((1L, "2024-01-01 10:03:00"),  // inside ±5 min of left k=1
        (2L, "2024-01-01 10:30:00"))  // outside the bound for k=2
      .toDF("k", "rts_s")
      .select(col("k"), to_timestamp(col("rts_s")).as("rts"))
      .write.parquet(s"$inR/f1")
    val (sl, sr) = (spark.read.parquet(s"$inL/f1").schema,
      spark.read.parquet(s"$inR/f1").schema)

    StateBackend.withRocksDb(spark) {
      val q = StreamJoin.joinWithinTime(
          spark.readStream.schema(sl).parquet(s"$inL/*"),
          spark.readStream.schema(sr).parquet(s"$inR/*"),
          Seq("k"), "lts", "rts",
          watermarkDelay = "1 minute", bound = "5 minutes")
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", chk)
        .format("parquet").option("path", out).start()
      q.awaitTermination()
    }
    val matched = spark.read.parquet(out).select("k").as[Long].collect().toSet
    assert(matched === Set(1L))
    assert(changelogCount(chk) > 0)
  }

  test("withStateBackend scopes and restores session configs") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    StateBackend.withRocksDb(spark) {
      assert(spark.conf.get(key) === StateBackend.RocksDbProvider)
    }
    assert(spark.conf.getOption(key) === before)
    // bounded-memory variant carries the cap
    val cfgs = StateBackend.rocksDbConfigs(boundedMemoryMB = 512)
    assert(cfgs("spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB") === "512")
    assert(cfgs("spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage") === "true")
  }
}
