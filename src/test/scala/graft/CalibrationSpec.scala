package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Calibration
import graft.ops.Windows

/** Aggregate-only OLS: exact recovery on exact-linear data, null
  * coefficients on degenerate designs, partition invariance; plus the
  * watermark-lateness audit's counting semantics.
  */
class CalibrationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("olsFit2 recovers an exact linear relation with r2 = 1") {
    // y = 3 + 2*x1 + 5*x2 over a non-degenerate integer grid
    val df = (for { a <- 1 to 20; b <- 1 to 5 }
      yield (a.toLong, (a * 7 % 11 + b).toLong))
      .toDF("x1", "x2")
      .withColumn("y", lit(3L) + col("x1") * 2L + col("x2") * 5L)
    val r = Calibration.olsFit2(df, col("x1"), col("x2"), col("y")).head()
    assert(r.getLong(0) === 100L)
    assert((r.getDouble(1), r.getDouble(2), r.getDouble(3)) === ((3.0, 2.0, 5.0)))
    assert(r.getDouble(4) === 1.0)
  }

  test("olsFit2 is partition-invariant (exact moments, no double sums)") {
    val df = (1 to 500).map(i =>
      (i.toLong, (i * 13 % 97).toLong, (i * 31 % 89 + i).toLong))
      .toDF("x1", "x2", "y")
    val a = Calibration.olsFit2(df, col("x1"), col("x2"), col("y"))
      .head().toSeq
    val b = Calibration.olsFit2(df.repartition(17), col("x1"), col("x2"),
      col("y")).head().toSeq
    assert(a === b)
  }

  test("olsFit2 reports nulls on a collinear design instead of blowing up") {
    val df = (1 to 50).map(i => (i.toLong, i.toLong * 2, i.toLong * 3))
      .toDF("x1", "x2", "y") // x2 = 2*x1 exactly
    val r = Calibration.olsFit2(df, col("x1"), col("x2"), col("y")).head()
    assert(r.getLong(0) === 50L)
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
  }

  test("latenessStats counts out-of-order events against each threshold") {
    // key 1 arrival order: t=100s, 400s, 150s (250s late), 410s, 405s (5s late)
    // key 2 in order: nothing late
    val df = Seq(
      (1L, 1L, 100L), (1L, 2L, 400L), (1L, 3L, 150L),
      (1L, 4L, 410L), (1L, 5L, 405L),
      (2L, 1L, 50L), (2L, 2L, 60L)
    ).toDF("k", "arr", "tsec")
      .select(col("k"), col("arr"),
        timestamp_micros(col("tsec") * 1000000L).as("ts"))
    val r = Windows.latenessStats(df, "k", "ts", "arr",
      thresholdsSec = Seq(10L, 200L)).head()
    assert(r.getLong(0) === 7L)                    // n_events
    assert(r.getLong(1) === 2L)                    // out of order: 150s, 405s
    assert(r.getLong(2) === 1L)                    // > 10s late: 250s only... and 5s no
    assert(r.getLong(3) === 1L)                    // > 200s late: the 250s one
    assert(r.getLong(4) === 250L * 1000000L)       // max lateness in micros
  }
}
