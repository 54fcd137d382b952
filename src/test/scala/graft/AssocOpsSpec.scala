package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Association/time-weighting ops: market-basket co-occurrence math,
  * the basket-size cap, the LOCF time-weighted average, and decayed
  * counts' grid-exact fold.
  */
class AssocOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("coOccurrence: hand-checked support/confidence/lift on 4 baskets") {
    // baskets: {x,y} {x,y} {x,z} {y}; n=4, n_x=3, n_y=3, n_z=1, n_xy=2
    val df = Seq((1, "x"), (1, "y"), (2, "x"), (2, "y"), (2, "y"), // dup row collapses
      (3, "x"), (3, "z"), (4, "y")).toDF("b", "i")
    val rows = graft.ops.Basket.coOccurrence(df, "b", "i")
      .orderBy("item_a", "item_b").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("x", "y"), ("x", "z")))
    val xy = rows(0)
    assert((xy.getLong(2), xy.getLong(3), xy.getLong(4)) === ((2L, 3L, 3L)))
    assert(xy.getDouble(5) === 0.5)          // support 2/4
    assert(xy.getDouble(6) === 0.666667)     // conf x→y
    assert(xy.getDouble(7) === 0.666667)     // conf y→x
    assert(xy.getDouble(8) === 0.888889)     // lift 2*4/(3*3)
    assert(xy.getDouble(9) === math.floor(math.log(8.0 / 9.0) * 1e6 + 0.5) / 1e6)
  }

  test("coOccurrence: over-cap baskets are dropped entirely") {
    val big = (1 to 10).map(i => (99, s"i$i"))
    val df = (Seq((1, "a"), (1, "b")) ++ big).toDF("b", "i")
    val rows = graft.ops.Basket.coOccurrence(df, "b", "i",
      maxItemsPerBasket = 5).collect()
    assert(rows.length === 1) // only the (a,b) pair; basket 99 gone
    assert(rows(0).getString(0) === "a" && rows(0).getString(1) === "b")
    // and the dropped basket is excluded from the totals too
    assert(rows(0).getDouble(5) === 1.0) // support = 1/1 baskets
  }

  test("timeWeightedAvg: holding durations weight the mean; singles are null") {
    // key A: v=100 holds 3s, v=200 holds 1s, v=0 terminal (no weight)
    //   twa = (100*3e6 + 200*1e6) / 4e6 = 125
    val df = Seq(
      ("A", 0L, 100L), ("A", 3L, 200L), ("A", 4L, 0L),
      ("B", 0L, 42L)
    ).toDF("k", "tsec", "v")
      .select(col("k"), timestamp_micros(col("tsec") * 1000000L).as("ts"),
        col("v"))
    val rows = graft.ops.Windows.timeWeightedAvg(df, "k", "ts", "v")
      .orderBy("k").collect()
    val a = rows(0)
    assert((a.getLong(1), a.getLong(2)) === ((3L, 4000000L)))
    assert(a.getDouble(3) === 125.0)
    assert(rows(1).getLong(1) === 1L && rows(1).isNullAt(3))
  }

  test("decayedCounts: exact half-life halving, future rows excluded") {
    val df = Seq(
      ("b1", "2024-01-11"), ("b1", "2024-01-11"),   // age 10 → w=0.5 each
      ("b1", "2024-01-21"),                          // age 0  → w=1
      ("b1", "2024-01-25"),                          // future → dropped
      ("b2", "2024-01-01")                           // age 20 → w=0.25
    ).toDF("brand", "d").select(col("brand"), col("d").cast("date").as("d"))
    val rows = graft.ops.Decay.decayedCounts(df, Seq("brand"), col("d"),
      asOf = "2024-01-21", halfLifeDays = 10.0).orderBy("brand").collect()
    assert((rows(0).getLong(1), rows(0).getDouble(2)) === ((3L, 2.0)))
    assert((rows(1).getLong(1), rows(1).getDouble(2)) === ((1L, 0.25)))
  }
}
