package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.SegmentDedup
import graft.streaming.SegmentDedupStream

/** Streaming segment dedup: an id-ordered replay through the
  * fingerprint-keyed first-keeper state must mark EXACTLY the segment
  * occurrences the batch path ([[graft.llm.SegmentDedup.keepFirst]])
  * keeps, with state carried across micro-batches on RocksDB.
  */
class SegmentDedupStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // w=2 segments; "p q" recurs within doc 1, across docs, and across
  // MICRO-batches (doc 4 arrives in batch 2 and must lose to state
  // rehydrated from the checkpoint)
  private val docs = Seq(
    (1L, "p q p q r s"),
    (2L, "p q t u"),
    (3L, "v w x y"),
    (4L, "p q v w z z"))

  test("replayed stream reproduces the batch keeper verdicts across micro-batches (RocksDB)") {
    val df = docs.toDF("doc_id", "text")
    val batch = SegmentDedup.keepFirst(
        SegmentDedup.segments(df, "doc_id", "text", w = 2), "doc_id")
      .select(col("doc_id"), col("seg_idx"), col("kept"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getBoolean(2))
      .toMap

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val root = Files.createTempDirectory("segdedupstream").toString
      val (in, out, chk) = (s"$root/in", s"$root/out", s"$root/chk")
      docs.take(3).toDF("doc_id", "text").write.parquet(s"$in/f1")
      val schema = spark.read.parquet(s"$in/f1").schema

      def runOnce(): Unit = {
        val stream = spark.readStream.schema(schema).parquet(s"$in/*")
        val q = SegmentDedupStream.segmentVerdicts(stream, "doc_id",
            "text", w = 2)
          .writeStream
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation", chk)
          .format("parquet").option("path", out)
          .start()
        q.awaitTermination()
      }
      runOnce()
      docs.drop(3).toDF("doc_id", "text").write.parquet(s"$in/f2")
      runOnce()

      val got = spark.read.parquet(out)
        .select(col("id"), col("seg_idx"), col("kept"),
          col("keeper_doc"), col("keeper_idx"))
        .collect()
      // one verdict per segment occurrence
      assert(got.length === batch.size)
      // id-ordered replay ≡ batch keeper rule, occurrence by occurrence
      got.foreach { r =>
        val k = (r.getLong(0), r.getInt(1))
        assert(r.getBoolean(2) === batch(k), s"verdict mismatch at $k")
      }
      // every removed occurrence names a keeper that was itself kept
      val kept = got.filter(_.getBoolean(2))
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      got.filterNot(_.getBoolean(2)).foreach { r =>
        assert(kept.contains((r.getLong(3), r.getInt(4))))
      }
      // doc 4's "p q" (batch 2) lost to doc 1's from checkpointed state
      val d4 = got.find(r => r.getLong(0) == 4L && r.getInt(1) == 0).get
      assert(!d4.getBoolean(2) && d4.getLong(3) === 1L)
    } finally {
      prev match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
