package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.IncrementalDedup

/** Cross-batch dedup against the persistent fingerprint index: first
  * batch self-dedups, later batches drop docs already ingested, replays
  * are idempotent (partitioned index + pruned self-partition read).
  */
class IncrementalDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft-inc-dedup").toString + "/idx"

  private val b1 = Seq(
    (0L, "alpha content one"),
    (1L, "beta content two"),
    (2L, "alpha content one") // in-batch dup of 0
  ).toDF("doc_id", "text")
  private val b2 = Seq(
    (10L, "beta content two"),   // cross-batch dup of 1
    (11L, "gamma content three"),
    (12L, "gamma content three") // in-batch dup of 11
  ).toDF("doc_id", "text")

  test("in-batch and cross-batch dups drop; survivors' fingerprints index") {
    val idx = tmp()
    val s1 = IncrementalDedup.ingestBatch(spark, b1, "doc_id", "text", idx, 1L)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 === Set(0L, 1L))
    val s2 = IncrementalDedup.ingestBatch(spark, b2, "doc_id", "text", idx, 2L)
      .select("doc_id").as[Long].collect().toSet
    assert(s2 === Set(11L))
    // index holds one row per distinct fingerprint, tagged by batch
    val byBatch = spark.read.parquet(idx).groupBy("batch_id").count()
      .as[(Long, Long)].collect().toMap
    assert(byBatch === Map(1L -> 2L, 2L -> 1L))
  }

  test("replaying a batch is idempotent: same survivors, no self-conflict") {
    val idx = tmp()
    IncrementalDedup.ingestBatch(spark, b1, "doc_id", "text", idx, 1L).count()
    IncrementalDedup.ingestBatch(spark, b2, "doc_id", "text", idx, 2L).count()
    // replay batch 2 — its own prior fingerprints must NOT shadow it
    val replay = IncrementalDedup.ingestBatch(spark, b2, "doc_id", "text", idx, 2L)
      .select("doc_id").as[Long].collect().toSet
    assert(replay === Set(11L))
    // and the index did not grow
    assert(spark.read.parquet(idx).count() === 3L)
  }

  test("a replayed batch with DIFFERENT content replaces its slice") {
    val idx = tmp()
    IncrementalDedup.ingestBatch(spark, b1, "doc_id", "text", idx, 1L).count()
    // batch 1 v2 drops the beta doc; its partition must shrink accordingly
    val b1v2 = Seq((0L, "alpha content one")).toDF("doc_id", "text")
    val s = IncrementalDedup.ingestBatch(spark, b1v2, "doc_id", "text", idx, 1L)
      .select("doc_id").as[Long].collect().toSet
    assert(s === Set(0L))
    assert(spark.read.parquet(idx).count() === 1L)
    // beta is ingestable again afterwards
    val s2 = IncrementalDedup.ingestBatch(spark,
      Seq((20L, "beta content two")).toDF("doc_id", "text"),
      "doc_id", "text", idx, 2L)
      .select("doc_id").as[Long].collect().toSet
    assert(s2 === Set(20L))
  }
}
