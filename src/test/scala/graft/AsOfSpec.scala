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

    // the native plan (custom logical node + strategy + merge exec)
    // produces the identical rows on the same inputs
    val native = AsOf.asofJoinNative(left, right, Seq("k"), "lts", "rts")
      .orderBy("k", "lts")
      .select("ev", "snap").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) -1 else r.getInt(1)))
    assert(native.toSeq === out.toSeq)
  }

  test("null join keys match nothing on all three paths (equi-join null semantics)") {
    // left null-key rows are KEPT with null right values (left-outer);
    // right null-key rows can never be carried onto anything — matching
    // the DuckDB ASOF LEFT JOIN oracle, where NULL = NULL is not a match
    val left = Seq(
      (Some(1), "2024-01-10 00:00:00", "k1"),
      (None, "2024-01-10 00:00:00", "knull")
    ).toDF("k", "lts_s", "ev")
      .select(col("k"), to_timestamp(col("lts_s")).as("lts"), col("ev"))
    val right = Seq(
      (Some(1), "2024-01-01 00:00:00", 100),
      (None, "2024-01-01 00:00:00", 999) // must never surface
    ).toDF("k", "rts_s", "snap")
      .select(col("k"), to_timestamp(col("rts_s")).as("rts"), col("snap"))
    def run(f: => org.apache.spark.sql.DataFrame): Seq[(String, Int)] =
      f.select("ev", "snap").collect()
        .map(r => (r.getString(0), if (r.isNullAt(1)) -1 else r.getInt(1)))
        .toSeq.sorted
    val expected = Seq(("k1", 100), ("knull", -1))
    assert(run(AsOf.asofJoin(left, right, Seq("k"), "lts", "rts")) === expected)
    assert(run(AsOf.asofJoinNative(left, right, Seq("k"), "lts", "rts")) === expected)
    // forward variant: right row after the left ts, same null-key contract
    val expectedFwd = Seq(("k1", -1), ("knull", -1))
    assert(run(AsOf.asofJoinForward(left, right, Seq("k"), "lts", "rts")) === expectedFwd)
  }

  test("forward as-of picks earliest right >= left ts; inclusive; null after last") {
    val left = Seq(
      (1, "2024-01-10 00:00:00", "e1"), // equal ts → counts (inclusive)
      (1, "2024-01-12 00:00:00", "e2"), // between rights → next (15th)
      (1, "2024-01-20 00:00:00", "e3"), // after last right → null
      (2, "2024-01-01 00:00:00", "e4")
    ).toDF("k", "lts_s", "ev")
      .select(col("k"), to_timestamp(col("lts_s")).as("lts"), col("ev"))
    val right = Seq(
      (1, "2024-01-10 00:00:00", 100),
      (1, "2024-01-15 00:00:00", 150),
      (2, "2024-03-01 00:00:00", 200)
    ).toDF("k", "rts_s", "snap")
      .select(col("k"), to_timestamp(col("rts_s")).as("rts"), col("snap"))
    val out = AsOf.asofJoinForward(left, right, Seq("k"), "lts", "rts")
      .orderBy("k", "lts")
      .select("ev", "snap").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) -1 else r.getInt(1)))
    assert(out.toSeq === Seq(("e1", 100), ("e2", 150), ("e3", -1),
      ("e4", 200)))
  }

  test("a user column named __l_asof_ts is neither hijacked nor dropped") {
    // same time types → no internal cast column is added; the join must
    // run on lts, not the user's identically-named column, and the
    // user's column must survive to the output
    val decoy = to_timestamp(lit("1970-01-01 00:00:00"))
    val left = Seq((1, "2024-01-10 00:00:00", "e1"))
      .toDF("k", "lts_s", "ev")
      .select(col("k"), to_timestamp(col("lts_s")).as("lts"), col("ev"),
        decoy.as("__l_asof_ts"))
    val right = Seq((1, "2024-01-05 00:00:00", 42))
      .toDF("k", "rts_s", "snap")
      .select(col("k"), to_timestamp(col("rts_s")).as("rts"), col("snap"))
    val out = AsOf.asofJoinNative(left, right, Seq("k"), "lts", "rts")
    assert(out.columns.contains("__l_asof_ts"), "user column was dropped")
    // joined on lts (2024) → snap matches; the 1970 decoy would miss
    assert(out.select("snap").head().getInt(0) === 42)
  }

  test("native as-of exec equals the composed form on skewed multi-partition data") {
    // 500 events over 7 users (one hot user), 60 snapshot rows
    val left = (1 to 500).map { i =>
      (if (i % 10 == 0) (i % 7).toLong else 3L, i.toLong * 1000, s"e$i")
    }.toDF("uid", "lt", "ev")
      .select(col("uid"), timestamp_micros(col("lt")).as("lts"), col("ev"))
    val right = (1 to 60).map { j =>
      ((j % 7).toLong, j.toLong * 7777, j * 10)
    }.toDF("uid", "rt", "snap")
      .select(col("uid"), timestamp_micros(col("rt")).as("rts"), col("snap"))

    val composed = AsOf.asofJoin(left, right, Seq("uid"), "lts", "rts")
      .select("uid", "ev", "snap")
      .orderBy("uid", "ev").collect().map(_.toSeq).toSeq
    val native = AsOf.asofJoinNative(left, right, Seq("uid"), "lts", "rts")
      .select("uid", "ev", "snap")
      .orderBy("uid", "ev").collect().map(_.toSeq).toSeq
    assert(native === composed)

    // the physical plan really is the custom operator (with planned
    // exchanges + sorts feeding it)
    val planStr = AsOf.asofJoinNative(left, right, Seq("uid"), "lts", "rts")
      .queryExecution.executedPlan.toString
    assert(planStr.contains("AsOfJoin"), planStr.take(500))
    assert(planStr.contains("Sort"), planStr.take(500))
  }

  test("native as-of: null right timestamps carry like the composed form, never stall the cursor") {
    // a null rts sorts NULLS FIRST (ascending), i.e. "infinitely early":
    // the composed form's last(ignoreNulls) window carries its values into
    // every later row of the key. Before the null-skip fix, the exec's
    // merge loop stalled on the null-time row and silently dropped ALL
    // later matches for the key (including valid rts <= lts ones).
    val left = Seq(
      (1L, 5L, "before-valid"),   // only the null-ts snapshot precedes it
      (1L, 15L, "after-valid"),   // a valid rts=10 row precedes it
      (2L, 50L, "no-null-key")    // control key without a null-ts row
    ).toDF("k", "lt", "ev")
      .select(col("k"), timestamp_micros(col("lt")).as("lts"), col("ev"))
    val right = Seq(
      (1L, None: Option[Long], 7),
      (1L, Some(10L), 100),
      (2L, Some(40L), 200)
    ).toDF("k", "rt", "snap")
      .select(col("k"),
        timestamp_micros(col("rt")).as("rts"), col("snap"))

    val composed = AsOf.asofJoin(left, right, Seq("k"), "lts", "rts")
      .select("k", "ev", "snap").orderBy("k", "ev")
      .collect().map(_.toSeq).toSeq
    val native = AsOf.asofJoinNative(left, right, Seq("k"), "lts", "rts")
      .select("k", "ev", "snap").orderBy("k", "ev")
      .collect().map(_.toSeq).toSeq
    assert(native === composed)
    // and the carried values are the ones the semantics demand
    val byEv = native.map(r => r(1) -> r(2)).toMap
    assert(byEv("before-valid") === 7)   // null-ts snapshot carried
    assert(byEv("after-valid") === 100)  // later valid snapshot NOT lost
    assert(byEv("no-null-key") === 200)
  }

  test("mixed NTZ/LTZ time flavors coerce instead of throwing, both forms agree") {
    // the r6 regression: events.ts read back from parquet as
    // TimestampNTZ while the probe side was cast to LTZ timestamp —
    // AsOfJoinPlan's equal-type invariant threw. asofJoinNative now
    // coerces the pair to a common type on internal columns; the
    // user-visible left schema keeps its original flavor.
    val left = Seq((1L, 5L, "a"), (1L, 15L, "b"), (2L, 9L, "c"))
      .toDF("k", "lt", "ev")
      .select(col("k"),
        timestamp_micros(col("lt")).cast("timestamp_ntz").as("lts"),
        col("ev"))
    val right = Seq((1L, 5L, 50), (1L, 10L, 100), (2L, 40L, 200))
      .toDF("k", "rt", "snap")
      .select(col("k"), timestamp_micros(col("rt")).as("rts"), col("snap"))
    assert(left.schema("lts").dataType.typeName === "timestamp_ntz")
    assert(right.schema("rts").dataType.typeName === "timestamp")

    val native = AsOf.asofJoinNative(left, right, Seq("k"), "lts", "rts")
    // output keeps the left column's declared NTZ flavor
    assert(native.schema("lts").dataType.typeName === "timestamp_ntz")
    val rows = native.select("ev", "snap").orderBy("ev").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) -1 else r.getInt(1)))
    assert(rows.toSeq === Seq(("a", 50), ("b", 100), ("c", -1)))
    // and the custom exec is still the operator that ran
    assert(native.queryExecution.executedPlan.toString.contains("AsOfJoin"))

    // flipped flavors (LTZ left, NTZ right) coerce the same way
    val leftLtz = left.select(col("k"), col("lts").cast("timestamp").as("lts"),
      col("ev"))
    val rightNtz = right.select(col("k"),
      col("rts").cast("timestamp_ntz").as("rts"), col("snap"))
    val flipped = AsOf.asofJoinNative(leftLtz, rightNtz, Seq("k"), "lts", "rts")
      .select("ev", "snap").orderBy("ev").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) -1 else r.getInt(1)))
    assert(flipped.toSeq === rows.toSeq)

    // date vs timestamp coerces too (date → midnight, monotonic)
    val rightDate = Seq((1L, "1970-01-01", 7)).toDF("k", "d", "snap")
      .select(col("k"), to_date(col("d")).as("rts"), col("snap"))
    val dr = AsOf.asofJoinNative(left, rightDate, Seq("k"), "lts", "rts")
      .select("ev", "snap").orderBy("ev").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) -1 else r.getInt(1)))
    assert(dr.toSeq === Seq(("a", 7), ("b", 7), ("c", -1)))
  }

  test("native as-of: keys with no right rows yield nulls; empty right side works") {
    val left = Seq((9L, 100L, "x")).toDF("k", "lt", "ev")
      .select(col("k"), timestamp_micros(col("lt")).as("lts"), col("ev"))
    val right = Seq((1L, 50L, 5)).toDF("k", "rt", "snap")
      .select(col("k"), timestamp_micros(col("rt")).as("rts"), col("snap"))
    val r1 = AsOf.asofJoinNative(left, right, Seq("k"), "lts", "rts").collect()
    assert(r1.length === 1 && r1(0).isNullAt(r1(0).fieldIndex("snap")))
    val r2 = AsOf.asofJoinNative(left, right.where(col("k") < 0), Seq("k"),
      "lts", "rts").collect()
    assert(r2.length === 1 && r2(0).isNullAt(r2(0).fieldIndex("snap")))
  }
}
