package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Skyline, Survivorship, Trend, Windows}

/** Round-7 late additions: Pareto-frontier sweep, golden-record
  * survivorship aggregates, per-lag ACF, and the exact rolling median —
  * all against hand-computed fixtures plus a brute-force cross-check
  * for the skyline.
  */
class FrontierOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ------------------------------------------------------------ skyline

  test("frontier2D matches the quadratic dominance definition") {
    // deterministic pseudo-random points, two groups
    val pts = (1 to 200).map { i =>
      val g = if (i % 2 == 0) "a" else "b"
      (g, i.toLong, (i * 37 % 101).toLong, (i * 59 % 97).toLong)
    }
    val df = pts.toDF("g", "id", "x", "y")
    val got = Skyline.frontier2D(df, Seq("g"), "x", "y", Seq("id"))
      .select("g", "x", "y").as[(String, Long, Long)].collect().toSet
    // brute force: dominated iff some other point is <=x, >=y, and
    // strictly better somewhere; coincident dupes collapse to one
    val brute = pts.groupBy(_._1).flatMap { case (g, rows) =>
      rows.filterNot { case (_, _, x, y) =>
        rows.exists { case (_, _, x2, y2) =>
          (x2 <= x && y2 >= y) && (x2 < x || y2 > y)
        }
      }.map(r => (g, r._3, r._4)).distinct
    }.toSet
    assert(got === brute)
  }

  test("frontier2D keeps one representative of coincident frontier points") {
    val df = Seq(("g", 1L, 5L, 9L), ("g", 2L, 5L, 9L), ("g", 3L, 6L, 9L))
      .toDF("g", "id", "x", "y")
    val got = Skyline.frontier2D(df, Seq("g"), "x", "y", Seq("id"))
      .select("id").as[Long].collect().toSeq
    assert(got === Seq(1L)) // dupe id=2 collapsed; id=3 dominated (worse x, equal y)
  }

  // ------------------------------------------------------- survivorship

  test("mostRecent picks latest non-null with key tiebreak") {
    val df = Seq(
      (1L, 10L, 100L, "old"), (1L, 20L, 101L, "new"),
      (1L, 20L, 102L, "newer-key"), (1L, 30L, 103L, null),
      (2L, 5L, 200L, null)).toDF("k", "ts", "id", "v")
    val got = df.groupBy($"k")
      .agg(Survivorship.mostRecent($"ts", $"id", $"v").as("v"))
      .as[(Long, Option[String])].collect().toMap
    // k=1: null at ts=30 skipped; tie at ts=20 → larger id wins
    assert(got === Map(1L -> Some("newer-key"), 2L -> None))
  }

  test("modalValue picks most frequent, ties to smallest value") {
    val df = Seq((1L, "b"), (1L, "b"), (1L, "a"), (1L, "a"), (1L, "c"),
      (2L, "z")).toDF("k", "v")
    val got = Survivorship.modalValue(df, Seq("k"), "v", "winner")
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "a", 2L -> "z")) // a ties b on 2 → smaller wins
  }

  test("longest picks the longest string, ties to smallest") {
    val df = Seq((1L, "aa"), (1L, "zz"), (1L, "b")).toDF("k", "v")
    val got = df.groupBy($"k").agg(Survivorship.longest($"v").as("v"))
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "zz")) // max struct: equal len → max value
  }

  // ------------------------------------------------------------- acf

  test("acf is 1 at the period of a perfectly periodic series") {
    // period-3 series over 90 ticks: lag 3 and 6 correlate perfectly
    val df = (0 until 90).map(t => (t.toLong, Seq(5L, 9L, 2L)(t % 3)))
      .toDF("t", "v")
    val r = Trend.acf(df, "t", "v", maxLag = 6)
      .select("lag", "r").as[(Int, Double)].collect().toMap
    assert(r(3) === 1.0 && r(6) === 1.0)
    assert(r(1) < 0.0 && r(2) < 0.0) // off-phase lags anticorrelate
  }

  test("acf handles gaps by pairwise deletion") {
    // ticks 0..9 with 5 missing: lag 1 pairs exclude (4,5) and (5,6)
    val df = (0 to 9).filter(_ != 5).map(t => (t.toLong, t.toLong))
      .toDF("t", "v")
    val row = Trend.acf(df, "t", "v", maxLag = 1).collect().head
    assert(row.getLong(1) === 7L) // 9 ticks → 8 adjacent pairs minus (4,5),(5,6) = 7
    assert(row.getDouble(2) === 1.0) // identity series stays perfectly correlated
  }

  // ---------------------------------------------------- rolling median

  test("rollingMedian computes exact trailing 3-row medians per key") {
    val df = Seq(("s", 1L, 10L), ("s", 2L, 100L), ("s", 3L, 20L),
      ("s", 4L, 30L), ("u", 1L, 7L)).toDF("k", "t", "v")
    val got = Windows.rollingMedian(df, Seq("k"), Seq($"t"), $"v", 3, "m")
      .orderBy($"k", $"t").select("m").as[Double].collect().toSeq
    // s: [10]→10, [10,100]→55, [10,100,20]→20, [100,20,30]→30; u: [7]→7
    assert(got === Seq(10.0, 55.0, 20.0, 30.0, 7.0))
  }

  /** In-memory replica of the Holt fixed-point recursion (Math.floorDiv
    * IS floor division — the semantics both engine twins must hit).
    */
  private def denseHolt(ys: Seq[Long], aN: Long, aD: Long, bN: Long,
                        bD: Long): (Long, Long) = {
    var s = ys.head
    var b = 0L
    ys.tail.foreach { y =>
      val sNew = Math.floorDiv(aN * y + (aD - aN) * (s + b), aD)
      b = Math.floorDiv(bN * (sNew - s) + (bD - bN) * b, bD)
      s = sNew
    }
    (s, b)
  }

  test("clampedBalance: two-scan identity equals the sequential max(0,·) recursion") {
    // deterministic pseudo-random movements, including deep deficits
    val deltas = (0 until 60).map(i => ((i * 2654435761L) % 21) - 10L)
    val rows = deltas.zipWithIndex.map { case (d, i) => ("p", i, d) } ++
      Seq(("q", 0, -5L), ("q", 1, 3L), ("q", 2, -1L)) // starts in deficit
    val got = graft.ops.Inventory.clampedBalance(
        rows.toDF("k", "t", "d"), Seq("k"), Seq(col("t")), "d")
      .orderBy(col("k"), col("t"))
      .collect().map(r => (r.getString(0), r.getLong(3), r.getLong(4)))
    def sequential(ds: Seq[Long]): Seq[(Long, Long)] =
      ds.scanLeft((0L, 0L)) { case ((b, _), d) =>
        val cand = b + d
        (math.max(0L, cand), math.max(0L, -cand))
      }.tail
    assert(got.filter(_._1 == "p").map(t => (t._2, t._3)).toSeq ===
      sequential(deltas))
    assert(got.filter(_._1 == "q").map(t => (t._2, t._3)).toSeq ===
      Seq((0L, 5L), (3L, 0L), (2L, 0L)))
  }

  test("holtLinear matches the integer replica; declining series go negative-trend") {
    // rising series for key r, steadily declining for key d (the
    // negative-trend path exercises FLOOR division, where truncation
    // toward zero silently diverges)
    val rows = (1 to 12).flatMap { t =>
      Seq(("r", t.toLong, 1000L * t), ("d", t.toLong, 13000L - 1000L * t))
    }
    val got = Trend.holtLinear(rows.toDF("key", "t", "cents"),
        "key", "t", "cents", 3L, 10L, 2L, 10L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (rs, rb) = denseHolt((1 to 12).map(1000L * _), 3, 10, 2, 10)
    val (ds, db) = denseHolt((1 to 12).map(13000L - 1000L * _), 3, 10, 2, 10)
    assert(got("r") === ((12L, rs, rb, rs + rb)))
    assert(got("d") === ((12L, ds, db, ds + db)))
    assert(rb > 0L && db < 0L)
    // a single observation: state = (y, 0)
    val one = Trend.holtLinear(Seq(("x", 1L, 42L)).toDF("key", "t", "cents"),
      "key", "t", "cents").collect().head
    assert(one.getLong(2) === 42L && one.getLong(3) === 0L)
  }
}
