package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.CdcChunks
import graft.streaming.CdcDedupStream

/** Streaming CDC dedup: the map-only chunker must cut exactly the
  * batch window-based chunks, and an id-ordered replay through the
  * fingerprint-keyed keeper must mark first arrivals across
  * micro-batches on RocksDB — including a shifted copy whose tail
  * chunks realign (the property fixed segments lack).
  */
class CdcDedupStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(23)
  private val vocab = Seq("a", "bb", "c", "dd", "e")
  private val body = Seq.fill(60)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
  // doc 3 is doc 1 with one token prepended — CDC chunks realign
  private val docs = Seq(
    (1L, body),
    (2L, "q r s t u v w x"),
    (3L, "zz " + body))

  test("chunksMapOnly cuts exactly the window-based batch chunks") {
    val df = docs.toDF("doc_id", "text")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.select("doc_id", "chunk_idx", "chunk_start", "chunk_end", "fp")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getString(4))).toSet
    assert(canon(CdcChunks.chunksMapOnly(df, "doc_id", "text")) ===
      canon(CdcChunks.chunks(df, "doc_id", "text")))
  }

  test("replayed stream marks first arrivals across micro-batches (RocksDB)") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val root = Files.createTempDirectory("cdcdedupstream").toString
      val (in, out, chk) = (s"$root/in", s"$root/out", s"$root/chk")
      docs.take(2).toDF("doc_id", "text").write.parquet(s"$in/f1")
      val schema = spark.read.parquet(s"$in/f1").schema

      def runOnce(): Unit = {
        val stream = spark.readStream.schema(schema).parquet(s"$in/*")
        val q = CdcDedupStream.chunkVerdicts(stream, "doc_id", "text")
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

      val got = spark.read.parquet(out)
        .collect().map(r => (r.getLong(0), r.getInt(1)) ->
          (r.getBoolean(2), r.getLong(3))).toMap

      // expected: per fingerprint, min (id, chunk_idx) is the keeper —
      // id order == arrival order here
      val ch = CdcChunks.chunksMapOnly(docs.toDF("doc_id", "text"),
          "doc_id", "text")
        .select("doc_id", "chunk_idx", "fp")
        .collect().map(r => (r.getLong(0), r.getLong(1).toInt, r.getString(2)))
      val keeper = ch.groupBy(_._3).view.mapValues(_.minBy(c => (c._1, c._2))).toMap
      ch.foreach { case (id, idx, fp) =>
        val k = keeper(fp)
        assert(got((id, idx)) === ((k._1 == id && k._2 == idx, k._1)),
          s"verdict mismatch at ($id, $idx)")
      }
      // the shifted doc 3 must LOSE at least one realigned tail chunk
      // to doc 1's state from micro-batch 1
      val doc3Lost = ch.filter(c => c._1 == 3L && keeper(c._3)._1 == 1L)
      assert(doc3Lost.nonEmpty, "CDC realignment fixture lost its property")
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
