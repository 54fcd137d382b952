package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Cohorts, Drift, Funnel, GapFill}

/** Round-6 longitudinal operators: ordered funnels, cohort retention,
  * calendar densification with LOCF, and PSI distribution drift.
  */
class SequenceOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def ev(rows: (Long, String, String)*) =
    rows.map { case (u, t, e) => (u, ts(t), e) }.toDF("user_id", "t", "typ")

  // ---------------------------------------------------------------- funnel

  private val funnelEvents = ev(
    (1L, "2024-01-01 00:00:01", "view"),
    (1L, "2024-01-01 00:00:02", "click"),
    (1L, "2024-01-01 00:00:03", "purchase"),
    // purchase BEFORE the click → step 3 never reached
    (2L, "2024-01-01 00:00:05", "view"),
    (2L, "2024-01-01 00:00:06", "purchase"),
    (2L, "2024-01-01 00:00:07", "click"),
    // click BEFORE the first view → stuck at step 1
    (3L, "2024-01-01 00:00:01", "click"),
    (3L, "2024-01-01 00:00:02", "view"),
    // click SIMULTANEOUS with view → strictly-after excludes it
    (4L, "2024-01-01 00:00:10", "view"),
    (4L, "2024-01-01 00:00:10", "click"))

  test("funnel: steps must be strictly ordered per entity") {
    val sum = Funnel.summary(funnelEvents, "user_id", "t", "typ",
        Seq("view", "click", "purchase"))
      .select("step", "n_entities").as[(Int, Long)].collect().toMap
    assert(sum === Map(1 -> 4L, 2 -> 2L, 3 -> 1L))
  }

  test("funnel: step times are the earliest valid reach times") {
    val t1 = Funnel.stepTimes(funnelEvents, "user_id", "t", "typ",
        Seq("view", "click", "purchase"))
      .where(col("user_id") === 1L)
      .select("t_1", "t_2", "t_3").as[(Timestamp, Timestamp, Timestamp)].head()
    assert(t1 === ((ts("2024-01-01 00:00:01"), ts("2024-01-01 00:00:02"),
      ts("2024-01-01 00:00:03"))))
  }

  test("funnel: revisiting an earlier step never rewinds progress") {
    val looped = ev(
      (9L, "2024-01-01 00:00:01", "view"),
      (9L, "2024-01-01 00:00:02", "click"),
      (9L, "2024-01-01 00:00:03", "view"), // re-view after click
      (9L, "2024-01-01 00:00:04", "purchase"))
    val sum = Funnel.summary(looped, "user_id", "t", "typ",
        Seq("view", "click", "purchase"))
      .select("step", "n_entities").as[(Int, Long)].collect().toMap
    assert(sum === Map(1 -> 1L, 2 -> 1L, 3 -> 1L))
  }

  // --------------------------------------------------------------- cohorts

  test("cohort retention: first-seen day buckets, distinct actives per offset") {
    val events = ev(
      (1L, "2024-01-01 10:00:00", "x"),
      (1L, "2024-01-01 23:00:00", "x"), // same user+day → once at offset 0
      (1L, "2024-01-03 09:00:00", "x"),
      (2L, "2024-01-01 01:00:00", "x"),
      (2L, "2024-01-03 01:00:00", "x"),
      (3L, "2024-01-02 12:00:00", "x"))
    val r = Cohorts.retentionDaily(events, "user_id", "t")
      .collect().map(x => (x.getDate(0).toString, x.getInt(1), x.getLong(2)))
      .toSet
    assert(r === Set(("2024-01-01", 0, 2L), ("2024-01-01", 2, 2L),
      ("2024-01-02", 0, 1L)))
  }

  // --------------------------------------------------------------- gapfill

  test("month index arithmetic roundtrips across year boundaries") {
    val df = Seq(199511, 199512, 199601, 199612, 200001).toDF("m")
    val rt = df.select(GapFill.indexToYyyymm(GapFill.monthIndex(col("m"))).as("r"))
      .as[Int].collect().toSeq
    assert(rt === Seq(199511, 199512, 199601, 199612, 200001))
    val idx = df.select(GapFill.monthIndex(col("m")).as("i")).as[Long].collect()
    assert(idx(1) - idx(0) === 1L) // dec follows nov
    assert(idx(2) - idx(1) === 1L) // jan 96 follows dec 95
  }

  test("densify fills gap months with zeros and carries measures forward") {
    val monthly = Seq(
      ("a", 199511, 2L, 100L), ("a", 199602, 1L, 50L), // gap: 12, 01
      ("b", 199601, 3L, 70L)) // single month → no fill
      .toDF("k", "yyyymm", "n", "v")
    val dense = GapFill.densifyMonths(monthly, Seq("k"), "yyyymm",
        zeroFill = Seq("n"), locf = Seq("v"))
      .orderBy("k", "yyyymm")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(dense.toSeq === Seq(
      ("a", 199511, 2L, 100L),
      ("a", 199512, 0L, 100L), // generated, zero count, carried value
      ("a", 199601, 0L, 100L),
      ("a", 199602, 1L, 50L),
      ("b", 199601, 3L, 70L)))
  }

  // ----------------------------------------------------------- attribution

  private def evv(rows: (Long, String, String, java.lang.Long)*) =
    rows.toDF("user_id", "t", "typ", "v")
      .select(col("user_id"), to_timestamp(col("t")).as("t"), col("typ"), col("v"))

  test("last-touch: latest in-window touch wins; same-instant counts; stale is (none)") {
    import graft.ops.Attribution
    val events = evv(
      // u1: click then view before the purchase → view (later) credited
      (1L, "2024-01-01 10:00:00", "click", null),
      (1L, "2024-01-01 10:30:00", "view", null),
      (1L, "2024-01-01 11:00:00", "purchase", 100L),
      // u2: only touch is OUTSIDE the 1h lookback → unattributed
      (2L, "2024-01-01 08:00:00", "view", null),
      (2L, "2024-01-01 11:00:00", "purchase", 50L),
      // u3: touch at exactly the conversion instant counts; among
      // same-ts touches the lexicographically last type wins
      (3L, "2024-01-01 11:00:00", "click", null),
      (3L, "2024-01-01 11:00:00", "view", null),
      (3L, "2024-01-01 11:00:00", "purchase", 10L),
      // u4: the only touch is AFTER the conversion → unattributed
      (4L, "2024-01-01 11:30:00", "view", null),
      (4L, "2024-01-01 11:00:00", "purchase", 20L))
    val r = Attribution.lastTouch(events, "user_id", "t", "typ", "v",
        Seq("view", "click"), "purchase", lookbackSec = 3600L)
      .select(col("user_id"), col("channel"))
      .collect().map(x => x.getLong(0) -> Option(x.getString(1))).toMap
    assert(r === Map(1L -> Some("view"), 2L -> None, 3L -> Some("view"),
      4L -> None))
  }

  test("simultaneous conversions merge before the linear split — no lost credit") {
    import graft.ops.Attribution
    val events = evv(
      (1L, "2024-01-01 10:30:00", "view", null),
      (1L, "2024-01-01 10:40:00", "click", null),
      // two purchases at the SAME instant: combined 120 splits over the
      // 2 touches (60 each); a per-row split would credit only 60 total
      (1L, "2024-01-01 11:00:00", "purchase", 90L),
      (1L, "2024-01-01 11:00:00", "purchase", 30L))
    val total = Attribution.linearCredit(events, "user_id", "t", "typ", "v",
        Seq("view", "click"), "purchase", lookbackSec = 3600L,
        bucketWidthSec = 600L)
      .agg(sum(col("credit"))).as[Double].head()
    assert(total === 120.0)
  }

  test("linear credit splits the conversion across in-window touches") {
    import graft.ops.Attribution
    val events = evv(
      (1L, "2024-01-01 10:00:00", "click", null),
      (1L, "2024-01-01 10:30:00", "view", null),
      (1L, "2024-01-01 09:00:00", "view", null), // outside 1h lookback
      (1L, "2024-01-01 11:00:00", "purchase", 90L))
    val r = Attribution.linearCredit(events, "user_id", "t", "typ", "v",
        Seq("view", "click"), "purchase", lookbackSec = 3600L,
        bucketWidthSec = 600L)
      .select(col("channel"), col("credit")).as[(String, Double)]
      .collect().toSet
    assert(r === Set(("click", 45.0), ("view", 45.0))) // 2 touches in window
  }

  test("position credit: 40/20/40 with 1- and 2-touch conventions") {
    import graft.ops.Attribution
    val events = evv(
      // user 1: four touches → 40 / 10 / 10 / 40 of 100
      (1L, "2024-01-01 10:00:00", "view", null),
      (1L, "2024-01-01 10:10:00", "click", null),
      (1L, "2024-01-01 10:20:00", "view", null),
      (1L, "2024-01-01 10:30:00", "click", null),
      (1L, "2024-01-01 11:00:00", "purchase", 100L),
      // user 2: one touch → 100%
      (2L, "2024-01-01 10:00:00", "view", null),
      (2L, "2024-01-01 11:00:00", "purchase", 80L),
      // user 3: two touches → 50/50
      (3L, "2024-01-01 10:00:00", "view", null),
      (3L, "2024-01-01 10:30:00", "click", null),
      (3L, "2024-01-01 11:00:00", "purchase", 60L))
    val r = Attribution.positionCredit(events, "user_id", "t", "typ", "v",
        Seq("view", "click"), "purchase", lookbackSec = 3600L,
        bucketWidthSec = 600L)
      .select(col("user_id"), col("touch_ts").cast("string"), col("credit"))
      .as[(Long, String, Long)].collect()
    val u1 = r.filter(_._1 == 1L).map(t => t._2.substring(11, 16) -> t._3).toMap
    assert(u1 === Map("10:00" -> 40L, "10:10" -> 10L, "10:20" -> 10L,
      "10:30" -> 40L))
    assert(r.filter(_._1 == 2L).map(_._3).toSeq === Seq(80L))
    assert(r.filter(_._1 == 3L).map(_._3).sorted.toSeq === Seq(30L, 30L))
  }

  test("two-proportion z: separation sign, symmetric arms, degenerate nulls") {
    import graft.ops.Stats
    def z(rows: Seq[(Boolean, Boolean)]): java.lang.Double = {
      val r = Stats.twoProportionZ(rows.toDF("a", "y"), col("a"), col("y"))
        .head()
      if (r.isNullAt(6)) null else r.getDouble(6)
    }
    // A converts 3/4, B converts 1/4 → strongly positive z
    val sep = z(Seq((true, true), (true, true), (true, true), (true, false),
      (false, true), (false, false), (false, false), (false, false)))
    assert(sep > 1.0)
    // swapping arms flips the sign exactly
    val flipped = z(Seq((false, true), (false, true), (false, true),
      (false, false), (true, true), (true, false), (true, false),
      (true, false)))
    assert(math.abs(sep + flipped) < 1e-9)
    // identical rates → z = 0; all-success pool → null
    assert(z(Seq((true, true), (true, false), (false, true),
      (false, false))) === 0.0)
    assert(z(Seq((true, true), (false, true))) === null)

    // degenerate-input contract: empty input → ZERO counts (not NULLs),
    // null rates/z; null-outcome rows are excluded from their arm's n
    import graft.ops.Stats
    val empty = Stats.twoProportionZ(
      Seq.empty[(Boolean, Boolean)].toDF("a", "y"), col("a"), col("y")).head()
    assert((0 to 3).map(empty.getLong) === Seq(0L, 0L, 0L, 0L))
    assert((4 to 6).forall(empty.isNullAt))
    val withNulls = Stats.twoProportionZ(
      Seq((Some(true), Some(true)), (Some(true), None), (None, Some(true)),
        (Some(false), Some(false))).toDF("a", "y"), col("a"), col("y")).head()
    // the (true, null) and (null, true) rows count nowhere
    assert((0 to 3).map(withNulls.getLong) === Seq(1L, 1L, 1L, 0L))
  }

  test("topPaths: prefix order, tiebreaks, truncation at maxLen") {
    import graft.ops.Transitions
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", "view", 1L),
      (1L, "2024-01-01 10:01:00", "click", 2L),
      (2L, "2024-01-01 09:00:00", "view", 3L),
      (2L, "2024-01-01 09:02:00", "click", 4L),
      (3L, "2024-01-01 08:00:00", "view", 5L),
      (3L, "2024-01-01 08:01:00", "purchase", 6L),
      // same-instant tie inside user 3's prefix orders by type
      (3L, "2024-01-01 08:01:00", "click", 7L))
      .toDF("u", "t", "y", "id")
      .withColumn("t", col("t").cast("timestamp"))
    val got = Transitions.topPaths(ev, "u", "t", "y", "id",
        maxLen = 2, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // maxLen=2 truncates user 3 to view>click (click < purchase at the tie)
    assert(got === Map("view>click" -> 3L))
  }

  // ----------------------------------------------------------- transitions

  test("transition counts pair consecutive events per entity in time order") {
    import graft.ops.Transitions
    val events = ev(
      (1L, "2024-01-01 00:00:01", "a"), (1L, "2024-01-01 00:00:02", "b"),
      (1L, "2024-01-01 00:00:03", "c"),
      (2L, "2024-01-01 00:00:01", "a"), (2L, "2024-01-01 00:00:02", "c"))
    val r = Transitions.transitionCounts(events, "user_id", "t", "typ")
      .select("from_type", "to_type", "n_transitions", "p")
      .as[(String, String, Long, Double)].collect()
      .map { case (f, to, n, p) => (f, to) -> ((n, p)) }.toMap
    // from 'a': a→b once, a→c once → p = 0.5 each; b→c certain
    assert(r === Map(("a", "b") -> ((1L, 0.5)), ("a", "c") -> ((1L, 0.5)),
      ("b", "c") -> ((1L, 1.0))))
  }

  test("transitions: simultaneous events pair in type order; last event emits none") {
    import graft.ops.Transitions
    val events = ev(
      (1L, "2024-01-01 00:00:01", "b"), // same ts as the 'a' below
      (1L, "2024-01-01 00:00:01", "a"))
    val r = Transitions.transitionCounts(events, "user_id", "t", "typ")
      .select("from_type", "to_type").as[(String, String)].collect().toSeq
    assert(r === Seq(("a", "b"))) // type order breaks the tie; 1 pair only
  }

  // ----------------------------------------------------------------- drift

  test("PSI is zero for identical distributions") {
    val a = Seq(10L, 10L, 25L, 40L).toDF("v")
    val r = Drift.psi(a, a, col("v"), 10L)
      .select("n_buckets", "n_a", "n_b", "psi")
      .as[(Long, Long, Long, Double)].head()
    assert(r === ((3L, 4L, 4L, 0.0)))
  }

  test("PSI bucketing is integer-exact past the double mantissa") {
    import graft.ops.Drift
    // 2^53 and 2^53+1 collapse to one double but must bucket apart
    val big = Seq(9007199254740992L, 9007199254740993L).toDF("v")
    val n = Drift.bucketCounts(big, col("v"), 1L).count()
    assert(n === 2L)
  }

  test("PSI on disjoint distributions matches the hand-computed sum") {
    val a = Seq(1L, 2L, 3L, 4L).toDF("v")   // all bucket 0
    val b = Seq(11L, 12L, 13L, 14L).toDF("v") // all bucket 1
    val r = Drift.psi(a, b, col("v"), 10L).select("psi").as[Double].head()
    // B=2: p=(4.5/5, 0.5/5), q=(0.5/5, 4.5/5) → 2 · 0.8 · ln 9
    assert(r === BigDecimal(1.6 * math.log(9.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("KS is 0 for identical and 1 for disjoint distributions") {
    val a = Seq(1L, 2L, 3L, 4L).toDF("v")
    val b = Seq(11L, 12L, 13L, 14L).toDF("v")
    val same = Drift.ks(a, a, col("v"), 10L).select("ks").as[Double].head()
    assert(same === 0.0)
    val disj = Drift.ks(a, b, col("v"), 10L)
      .select(col("ks")).as[Double].head()
    assert(disj === 1.0) // full mass gap at bucket 0: |4·4 − 0·4| / 16
  }

  test("KS picks the single worst ECDF gap, exactly") {
    // a buckets: [0,0,0,1]; b buckets: [0,1,1,1] → cum gaps |3·4−1·4|=8, 0
    val a = Seq(1L, 2L, 3L, 14L).toDF("v")
    val b = Seq(1L, 12L, 13L, 14L).toDF("v")
    val r = Drift.ks(a, b, col("v"), 10L)
      .select(col("n_buckets"), col("n_a"), col("n_b"), col("ks"))
      .as[(Long, Long, Long, Double)].head()
    assert(r === ((2L, 4L, 4L, 0.5))) // worst gap |3·4−1·4| / 16
  }

  test("sequence likelihood: nano-exact smoothed log-probs on the V×V grid") {
    import graft.ops.Transitions
    // A: x→x→x (two (x,x) hops); B: x→y. V=2, from-total(x)=3.
    // lp(x,x)=ln(3/5), lp(x,y)=ln(2/5) — nano-rounded once at grid grain
    val df = Seq(
      ("A", 1L, "x"), ("A", 2L, "x"), ("A", 3L, "x"),
      ("B", 1L, "x"), ("B", 2L, "y")
    ).toDF("u", "t", "typ")
      .select(col("u"), timestamp_micros(col("t") * 1000000L).as("ts"),
        col("typ"))
    val rows = Transitions.sequenceLikelihood(df, "u", "ts", "typ")
      .orderBy("u").collect()
    val a = rows(0)
    assert((a.getLong(1), a.getLong(2)) === ((2L, 2L * -510825624L)))
    assert(a.getDouble(3) === -0.510826)
    val b = rows(1)
    assert((b.getLong(1), b.getLong(2)) === ((1L, -916290732L)))
    assert(b.getDouble(3) === -0.916291)
  }
}
