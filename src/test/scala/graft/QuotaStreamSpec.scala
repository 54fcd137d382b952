package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.QuotaStream
import graft.streaming.QuotaStream.{Admission, DocRef}

/** Streaming per-source admission quota on the transformWithState API:
  * caps enforce across micro-batch runs via checkpointed ValueState,
  * every row is emitted with its admission verdict, keys are
  * independent.
  */
class QuotaStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("per-source caps persist across micro-batch runs; rejects are audited") {
    // transformWithState requires the RocksDB state store provider
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val root = Files.createTempDirectory("quotastream").toString
      val (in, out, chk) = (s"$root/in", s"$root/out", s"$root/chk")

      // batch 1: 3 docs from s1, 1 from s2; cap = 2 per source
      Seq(DocRef("s1", 1L), DocRef("s1", 2L), DocRef("s1", 3L),
        DocRef("s2", 10L)).toDS().write.parquet(s"$in/f1")
      val schema = spark.read.parquet(s"$in/f1").schema

      def runOnce(): Unit = {
        val stream = spark.readStream.schema(schema).parquet(s"$in/*")
          .as[DocRef]
        val q = QuotaStream.admit(stream, cap = 2L)
          .writeStream
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation", chk)
          .format("parquet").option("path", out)
          .start()
        q.awaitTermination()
      }
      runOnce()
      val r1 = spark.read.parquet(out).as[Admission].collect()
      // every row audited; exactly 2 of s1's 3 admitted (the cap), s2 all in
      assert(r1.length === 4)
      assert(r1.filter(_.source == "s1").count(_.admitted) === 2)
      assert(r1.filter(_.source == "s1").count(!_.admitted) === 1)
      assert(r1.filter(_.source == "s2").forall(_.admitted))

      // batch 2: more s1 (already at cap → all rejected) and fresh s2
      // (one slot left) — state carried through the checkpoint
      Seq(DocRef("s1", 4L), DocRef("s2", 11L), DocRef("s2", 12L))
        .toDS().write.parquet(s"$in/f2")
      runOnce()
      val r2 = spark.read.parquet(out).as[Admission].collect()
      assert(r2.length === 7)
      assert(!r2.find(_.id == 4L).get.admitted) // s1 stays capped
      // s2 had 1 admitted; exactly one of {11, 12} takes the last slot
      assert(r2.filter(_.source == "s2").count(_.admitted) === 2)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
