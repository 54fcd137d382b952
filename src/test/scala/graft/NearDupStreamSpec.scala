package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.MinHash
import graft.streaming.NearDupStream

/** Streaming MinHash-LSH near-dedup: an id-ordered replay of a corpus
  * through the band-bucket processor must flag EXACTLY the documents
  * the batch path ([[graft.llm.Dedup.dropNearDups]]'s dropped set)
  * drops, with state carried across micro-batches on the RocksDB
  * backend (the only provider transformWithState supports).
  */
class NearDupStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"),
    (3L, "the quick brown fox leaps over the lazy dog again and again"),
    (4L, "entirely different content about distributed stream processing"),
    (5L, "entirely different content about distributed stream processing"),
    (6L, "nothing shares shingles with this one at all honestly truly"))

  test("replayed stream reproduces the batch near-dup verdicts across micro-batches (RocksDB)") {
    val df = docs.toDF("doc_id", "text")
    // batch ground truth: the ids dropNearDups would drop
    val batchDropped = MinHash.dupPairs(df, "doc_id", "text")
      .where(col("est_jaccard") >= 0.5)
      .select(col("id_b")).distinct().as[Long].collect().toSet

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val root = Files.createTempDirectory("neardupstream").toString
      val (in, out, chk) = (s"$root/in", s"$root/out", s"$root/chk")

      // id-ordered replay split across TWO batches: 2's dup-of-1 verdict
      // resolves within batch 1; 3 and 5 must match against state
      // REHYDRATED from the checkpoint in batch 2
      docs.take(2).toDF("doc_id", "text").write.parquet(s"$in/f1")
      val schema = spark.read.parquet(s"$in/f1").schema

      def runOnce(): Unit = {
        val stream = spark.readStream.schema(schema).parquet(s"$in/*")
        val q = NearDupStream.nearDupVerdicts(stream, "doc_id", "text")
          .writeStream
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation", chk)
          .format("parquet").option("path", out)
          .start()
        q.awaitTermination()
      }
      runOnce()
      docs.drop(2).toDF("doc_id", "text").write.parquet(s"$in/f2")
      runOnce()

      val verdicts = spark.read.parquet(out)
      // every doc got one verdict per band (k=8, rowsPerBand=2 → 4)
      assert(verdicts.count() === docs.length * 4L)
      val flagged = NearDupStream.collapseVerdicts(verdicts)
        .where(col("dup")).select(col("id")).as[Long].collect().toSet
      assert(flagged === batchDropped)
      // matched_id points at an EARLIER doc for every flagged one
      val matches = NearDupStream.collapseVerdicts(verdicts)
        .where(col("dup"))
        .select(col("id"), col("matched_id")).as[(Long, Long)].collect()
      assert(matches.forall { case (id, m) => m >= 0 && m < id })
    } finally {
      prev match {
        case Some(v) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("hot-bucket cap saturates conservatively: verification continues, admission stops") {
    // cap 1: the bucket stores only doc 1; docs 2 and 3 are still
    // VERIFIED against it (conservative saturation — admission stops,
    // verification continues)
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val root = Files.createTempDirectory("neardupcap").toString
      val (in, out, chk) = (s"$root/in", s"$root/out", s"$root/chk")
      val three = Seq(
        (1L, "alpha beta gamma delta epsilon zeta"),
        (2L, "alpha beta gamma delta epsilon zeta"),
        (3L, "alpha beta gamma delta epsilon zeta"))
      three.toDF("doc_id", "text").write.parquet(s"$in/f1")
      val schema = spark.read.parquet(s"$in/f1").schema
      val q = NearDupStream.nearDupVerdicts(
          spark.readStream.schema(schema).parquet(s"$in/*"),
          "doc_id", "text", maxPerBucket = 1)
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", chk)
        .format("parquet").option("path", out)
        .start()
      q.awaitTermination()
      val collapsed = NearDupStream.collapseVerdicts(spark.read.parquet(out))
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      // 2 and 3 both verify against stored doc 1 (the only admitted
      // member); nothing is lost to the cap on this corpus, but only
      // doc 1 occupies the bucket
      assert(collapsed === Map(1L -> false, 2L -> true, 3L -> true))
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
