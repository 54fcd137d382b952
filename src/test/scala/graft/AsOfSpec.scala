package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.AsOf

/** As-of join semantics: latest right row at-or-before each left ts. */
class AsOfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = to_timestamp(lit(s))

  test("picks latest right <= left ts; inclusive boundary; null before first") {
    val left = Seq(
      (1, "2024-01-10 00:00:00", "e1"),
      (1, "2024-01-20 00:00:00", "e2"),
      (1, "2024-01-05 00:00:00", "e0"), // before any right row → null
      (2, "2024-03-01 00:00:00", "e3")
    ).toDF("k", "lts_s", "ev")
      .select(col("k"), to_timestamp(col("lts_s")).as("lts"), col("ev"))
    val right = Seq(
      (1, "2024-01-10 00:00:00", 100), // equal ts → counts (inclusive)
      (1, "2024-01-15 00:00:00", 150),
      (2, "2024-01-01 00:00:00", 200)
    ).toDF("k", "rts_s", "snap")
      .select(col("k"), to_timestamp(col("rts_s")).as("rts"), col("snap"))
    val out = AsOf.asofJoin(left, right, Seq("k"), "lts", "rts")
      .orderBy("k", "lts")
      .select("ev", "snap").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) -1 else r.getInt(1)))
    assert(out.toSeq === Seq(("e0", -1), ("e1", 100), ("e2", 150), ("e3", 200)))
  }
}
