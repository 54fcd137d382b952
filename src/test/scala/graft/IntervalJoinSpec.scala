package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.RangeJoin

/** Interval (range) join: native interval-sweep exec vs the bucketed
  * composition — the same two-engine differential pattern as AsOfSpec.
  */
class IntervalJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("native interval join: known matches, inclusive bounds, empty intervals") {
    val left = Seq(
      (1L, 10L, "in-both"),   // inside [5,15] and [10,20]
      (1L, 20L, "boundary"),  // end boundary of [10,20] — inclusive
      (1L, 4L, "before-all"),
      (2L, 99L, "other-key"),
      (3L, 50L, "no-intervals")
    ).toDF("k", "t", "ev")
      .select(col("k"), timestamp_micros(col("t")).as("ts"), col("ev"))
    val right = Seq(
      (1L, 5L, 15L, "a"),
      (1L, 10L, 20L, "b"),
      (1L, 30L, 25L, "inverted"), // start > end: matches nothing
      (2L, 90L, 110L, "c")
    ).toDF("k", "s", "e", "tag")
      .select(col("k"), timestamp_micros(col("s")).as("ws"),
        timestamp_micros(col("e")).as("we"), col("tag"))

    val got = RangeJoin.intervalJoinNative(left, right, Seq("k"), "ts", "ws", "we")
      .select("ev", "tag").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("in-both", "a"), ("in-both", "b"),
      ("boundary", "b"), ("other-key", "c")))

    // the physical plan really is the custom operator, fed by planned
    // exchanges + sorts
    val planStr = RangeJoin.intervalJoinNative(left, right, Seq("k"),
        "ts", "ws", "we")
      .queryExecution.executedPlan.toString
    assert(planStr.contains("IntervalJoin"), planStr.take(500))
    assert(planStr.contains("Sort"), planStr.take(500))
  }

  test("native ≡ bucketed composition on randomized multi-key data with nulls") {
    // 400 point rows over 9 keys (one hot), 120 intervals of mixed width,
    // sprinkled nulls on both sides, plus empty intervals — every edge the
    // two shapes could disagree on
    val left = (1 to 400).map { i =>
      val k = if (i % 5 == 0) (i % 9).toLong else 2L // hot key 2
      val t = if (i % 37 == 0) None else Some((i * 131L) % 3000)
      (k, t, s"e$i")
    }.toDF("k", "t", "ev")
      .select(col("k"), timestamp_micros(col("t")).as("ts"), col("ev"))
    val right = (1 to 120).map { j =>
      val k = (j % 9).toLong
      val s = (j * 203L) % 2800
      val e = if (j % 11 == 0) s - 50 else s + (j % 7) * 120L // some inverted
      val sOpt = if (j % 29 == 0) None else Some(s)
      (k, sOpt, e, j)
    }.toDF("k", "s", "e", "iv")
      .select(col("k"), timestamp_micros(col("s")).as("ws"),
        timestamp_micros(col("e")).as("we"), col("iv"))

    val composed = RangeJoin.intervalJoin(left, right, Seq("k"),
        "ts", "ws", "we", bucketWidth = 1) // 1-second buckets
      .select("k", "ev", "iv").orderBy("k", "ev", "iv")
      .collect().map(_.toSeq).toSeq
    val native = RangeJoin.intervalJoinNative(left, right, Seq("k"),
        "ts", "ws", "we")
      .select("k", "ev", "iv").orderBy("k", "ev", "iv")
      .collect().map(_.toSeq).toSeq
    assert(native === composed)
    assert(native.nonEmpty) // the fixture actually produces matches
  }

  test("native interval join: null keys match nothing, like an equi-join") {
    val left = Seq(
      (Some(1L), 10L, "k1"),
      (None: Option[Long], 10L, "knull")
    ).toDF("k", "t", "ev")
      .select(col("k"), timestamp_micros(col("t")).as("ts"), col("ev"))
    val right = Seq(
      (Some(1L), 5L, 15L, "a"),
      (None: Option[Long], 5L, 15L, "b")
    ).toDF("k", "s", "e", "tag")
      .select(col("k"), timestamp_micros(col("s")).as("ws"),
        timestamp_micros(col("e")).as("we"), col("tag"))
    val got = RangeJoin.intervalJoinNative(left, right, Seq("k"), "ts", "ws", "we")
      .select("ev", "tag").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("k1", "a"))) // the null-key rows never pair
  }

  test("native interval join: overlapping intervals all match; active set evicts") {
    // one key, stacked intervals: t=100 sits inside 3 of 4; a later left
    // row proves expired intervals really leave the active set
    val left = Seq((1L, 100L, "mid"), (1L, 500L, "late"))
      .toDF("k", "t", "ev")
      .select(col("k"), timestamp_micros(col("t")).as("ts"), col("ev"))
    val right = Seq(
      (1L, 0L, 1000L, "wide"),
      (1L, 50L, 150L, "tight"),
      (1L, 90L, 110L, "tighter"),
      (1L, 200L, 300L, "later-window")
    ).toDF("k", "s", "e", "tag")
      .select(col("k"), timestamp_micros(col("s")).as("ws"),
        timestamp_micros(col("e")).as("we"), col("tag"))
    val got = RangeJoin.intervalJoinNative(left, right, Seq("k"), "ts", "ws", "we")
      .select("ev", "tag").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    assert(got("mid") === Set("wide", "tight", "tighter"))
    assert(got("late") === Set("wide")) // the rest expired or never started
  }
}
