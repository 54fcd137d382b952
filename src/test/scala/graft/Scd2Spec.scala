package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.Scd2

/** Type-2 dimension history: change detection closes/opens versions,
  * partial snapshots leave absent keys untouched, replays are no-ops,
  * and asOf() time-travels to any past version.
  */
class Scd2Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def hist3 = {
    val s1 = Seq((1L, "bronze"), (2L, "silver")).toDF("k", "tier")
    val s2 = Seq((1L, "gold"), (2L, "silver"), (3L, "bronze")).toDF("k", "tier")
    val s3 = Seq((1L, "gold")).toDF("k", "tier") // partial snapshot
    val h1 = Scd2.init(s1, lit(10))
    val h2 = Scd2.mergeSnapshot(h1, s2, Seq("k"), Seq("tier"), lit(20))
    Scd2.mergeSnapshot(h2, s3, Seq("k"), Seq("tier"), lit(30))
  }

  test("changes close and reopen versions; stable and absent keys untouched") {
    val rows = hist3.orderBy("k", "valid_from")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getInt(2), if (r.isNullAt(3)) null else r.getInt(3), r.getBoolean(4)))
    assert(rows.toSeq === Seq(
      (1L, "bronze", 10, 20, false), // closed by the tier change at 20
      (1L, "gold", 20, null, true),  // unchanged by snapshot 3 (same tier)
      (2L, "silver", 10, null, true),// stable through s2, absent from s3
      (3L, "bronze", 20, null, true) // appeared at 20
    ))
  }

  test("re-merging the same snapshot at the same point is a no-op") {
    val h = hist3
    val again = Scd2.mergeSnapshot(h,
      Seq((1L, "gold")).toDF("k", "tier"), Seq("k"), Seq("tier"), lit(30))
    val norm = (df: org.apache.spark.sql.DataFrame) =>
      df.orderBy("k", "valid_from").collect().toSeq
    assert(norm(again) === norm(h))
  }

  test("asOf returns the version valid at each point") {
    val h = hist3
    def tiers(at: Int) = Scd2.asOf(h, lit(at))
      .select("k", "tier").as[(Long, String)].collect().toMap
    assert(tiers(10) === Map(1L -> "bronze", 2L -> "silver"))
    assert(tiers(25) === Map(1L -> "gold", 2L -> "silver", 3L -> "bronze"))
    // before the first snapshot: nothing existed
    assert(tiers(5) === Map.empty)
  }

  test("fromSnapshots ≡ foldSnapshots on a 12-snapshot stress sequence") {
    // 40 keys x 12 monthly partial snapshots: key k is present in month m
    // iff (k + m) % 5 != 0 (absences exercise the untouched-key path),
    // attr changes whenever (k * m) % 3 == 0, and every 4th present point
    // carries a NULL attr (null-safe change detection on both paths)
    def attr(k: Int, m: Int): Option[String] =
      if ((k + m) % 4 == 0) None else Some(s"v${(k * m) % 3}")
    val months = (1 to 12).map { m =>
      val rows = (1 to 40).filter(k => (k + m) % 5 != 0)
        .map(k => (k.toLong, attr(k, m)))
      (rows.toDF("k", "a"), lit(m))
    }
    val fold = Scd2.foldSnapshots(
      Scd2.init(months.head._1, months.head._2),
      months.tail, Seq("k"), Seq("a"), checkpointEvery = 3)
    val batch = Scd2.fromSnapshots(months, Seq("k"), Seq("a"))
    val norm = (df: org.apache.spark.sql.DataFrame) =>
      df.select("k", "a", "valid_from", "valid_to", "is_current")
        .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(norm(batch) === norm(fold))
    // sanity on the shape itself: opens exist past month 1, exactly one
    // current version per key that ever appeared
    val cur = batch.where(col("is_current")).count()
    assert(cur === 40)
    assert(batch.count() > 40)
  }

  test("null-safe attribute comparison: null->value and value->null are changes") {
    val s1 = Seq((1L, Option.empty[String]), (2L, Some("x"))).toDF("k", "a")
    val s2 = Seq((1L, Some("x")), (2L, Option.empty[String])).toDF("k", "a")
    val h = Scd2.mergeSnapshot(Scd2.init(s1, lit(1)), s2,
      Seq("k"), Seq("a"), lit(2))
    assert(h.count() === 4) // both keys: one closed + one open version
    val s2again = Scd2.mergeSnapshot(h, s2, Seq("k"), Seq("a"), lit(3))
    assert(s2again.count() === 4) // null <=> null is "unchanged"
  }
}
