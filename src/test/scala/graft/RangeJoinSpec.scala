package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.RangeJoin

/** Bucketed interval join ≡ naive key-join + BETWEEN filter, for any
  * bucket width; inclusive boundaries; empty intervals match nothing.
  */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mkLeft(rows: Seq[(Long, Long, String)]) =
    rows.toDF("k", "t", "ev")
      .select(col("k"), timestamp_micros(col("t") * 1000000L).as("ts"), col("ev"))
  private def mkRight(rows: Seq[(Long, Long, Long, Int)]) =
    rows.toDF("k", "s", "e", "tag")
      .select(col("k"), timestamp_micros(col("s") * 1000000L).as("ws"),
        timestamp_micros(col("e") * 1000000L).as("we"), col("tag"))

  test("equals the naive range join; boundaries inclusive; inverted interval empty") {
    val left = mkLeft(Seq(
      (1L, 100L, "a"), (1L, 200L, "b"), (1L, 301L, "c"), (2L, 100L, "d")))
    val right = mkRight(Seq(
      (1L, 100L, 200L, 10),  // catches a (start-inclusive) and b (end-inclusive)
      (1L, 250L, 300L, 20),  // catches nothing (301 is out)
      (2L, 500L, 400L, 30),  // inverted → nothing
      (2L, 0L, 1000L, 40)))  // catches d
    val got = RangeJoin.intervalJoin(left, right, Seq("k"), "ts", "ws", "we",
        bucketWidth = 60)
      .select("ev", "tag").as[(String, Int)].collect().toSet
    assert(got === Set(("a", 10), ("b", 10), ("d", 40)))
  }

  test("pairs are emitted exactly once regardless of bucket width") {
    val left = mkLeft((1 to 200).map(i => (i.toLong % 5, i.toLong * 10, s"e$i")))
    val right = mkRight((1 to 40).map(j =>
      (j.toLong % 5, j.toLong * 37, j.toLong * 37 + 150, j)))
    val naive = left.join(right, Seq("k"))
      .where(col("ts") >= col("ws") && col("ts") <= col("we"))
      .select("ev", "tag").as[(String, Int)].collect().sorted.toSeq
    for (width <- Seq(1L, 13L, 100L, 10000L)) {
      val bucketed = RangeJoin.intervalJoin(left, right, Seq("k"),
          "ts", "ws", "we", width)
        .select("ev", "tag").as[(String, Int)].collect().sorted.toSeq
      assert(bucketed === naive, s"width=$width")
    }
  }
}
