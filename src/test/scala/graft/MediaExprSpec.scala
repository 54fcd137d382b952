package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{MediaFixturePayload, MediaHeaderSniff}
import graft.llm.{MediaFixtures, MediaHeaders}

/** The codegen'd media expressions: generated-code vs interpreted
  * parity (the round-8 verdict's acceptance bar for replacing the
  * `mapPartitions` decode seam), agreement with the plain-Scala parser,
  * and null/corrupt handling inside a real plan.
  */
class MediaExprSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def payloads: Seq[(Long, Array[Byte])] = Seq(
    1L -> MediaFixtures.pngBytes(17, 23, 12),
    2L -> MediaFixtures.jpegBytes(640, 481),
    3L -> MediaFixtures.gifBytes(12, 9, 4),
    4L -> MediaFixtures.wavBytes(2, 16000, 777),
    5L -> "not a media payload".getBytes("UTF-8"),
    6L -> MediaFixtures.pngBytes(5, 5, 0).take(20), // truncated
    7L -> null)

  private def sniffViaPlan(): Seq[Row] =
    payloads.toDF("id", "payload")
      .select(col("id"), MediaHeaderSniff.sniff(col("payload")).as("m"))
      .orderBy("id").collect().toSeq

  test("expression agrees with MediaHeaders.sniff on every payload class") {
    val got = sniffViaPlan()
    payloads.sortBy(_._1).zip(got).foreach { case ((id, p), row) =>
      assert(row.getLong(0) === id)
      MediaHeaders.sniff(p) match {
        case None => assert(row.isNullAt(1), s"id=$id expected null struct")
        case Some(m) =>
          val st = row.getStruct(1)
          assert(st.getString(0) === m.format)
          def f(i: Int): Option[Int] =
            if (st.isNullAt(i)) None else Some(st.getInt(i))
          assert(f(1) === m.width, s"id=$id width")
          assert(f(2) === m.height, s"id=$id height")
          assert(f(3) === m.frames, s"id=$id frames")
          assert(f(4) === m.channels, s"id=$id channels")
          assert(f(5) === m.sampleRate, s"id=$id rate")
          assert(f(6) === m.bitDepth, s"id=$id depth")
      }
    }
  }

  test("codegen and interpreted paths produce identical rows") {
    val withCodegen = sniffViaPlan().map(_.toString)
    val conf = spark.conf
    val prevWs = conf.get("spark.sql.codegen.wholeStage")
    val prevFm = conf.get("spark.sql.codegen.factoryMode")
    try {
      conf.set("spark.sql.codegen.wholeStage", "false")
      conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      assert(sniffViaPlan().map(_.toString) === withCodegen)
    } finally {
      conf.set("spark.sql.codegen.wholeStage", prevWs)
      conf.set("spark.sql.codegen.factoryMode", prevFm)
    }
  }

  test("fixture-payload expression emits the builder's exact bytes") {
    val rows = Seq((0L, 10L), (1L, 99L), (2L, 31L), (3L, 5L), (7L, 4095L))
      .toDF("d", "n")
      .select(col("d"), col("n"),
        MediaFixturePayload.payload(col("d"), col("n")).as("p"))
      .collect()
    rows.foreach { r =>
      val expect = MediaFixturePayload.payloadFor(r.getLong(0), r.getLong(1))
      assert(r.getAs[Array[Byte]](2).toSeq === expect.toSeq,
        s"d=${r.getLong(0)} n=${r.getLong(1)}")
    }
  }

  test("sniff expression survives whole-stage codegen in a grouped plan") {
    // an aggregate over struct fields keeps the expression inside a
    // WholeStageCodegen span; count formats over a 200-row fixture frame
    val df = (0L until 200L).map(d => (d, 50L + d % 97)).toDF("d", "n")
      .select(MediaHeaderSniff.sniff(
        MediaFixturePayload.payload(col("d"), col("n"))).as("m"))
      .groupBy(col("m.format").as("format")).count()
    val counts = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("png" -> 50L, "jpeg" -> 50L, "gif" -> 50L,
      "wav" -> 50L))
  }
}
