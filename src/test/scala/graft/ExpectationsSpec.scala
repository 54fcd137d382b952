package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pdq.Expectations
import graft.ops.{Attribution, Windows}

/** Round-7 batch 3: the declarative expectation suite, the reach curve,
  * and time-decay attribution.
  */
class ExpectationsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("expectation suite reports exact per-rule failures in one pass") {
    val df = Seq(
      (Some(1L), "A", 10.0, "1-HI"), (Some(2L), "B", 20.0, "2-LO"),
      (Some(2L), "Z", -5.0, "bad"), (None, "A", 999.0, null))
      .toDF("k", "status", "price", "prio")
    val got = Expectations.run(df, Seq(
        Expectations.notNull("k"),
        Expectations.unique(Seq("k")),
        Expectations.acceptedValues("status", Seq("A", "B")),
        Expectations.inRange("price", 0.0, 100.0),
        Expectations.matchesRegex("prio", "^[1-5]-")))
      .select("rule", "n_checked", "n_failed", "passed")
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("not_null:k") === ((4L, 1L, false)))
    // 4 rows, 3 distinct key structs (1, 2, null) → 1 duplicate
    assert(got("unique:k") === ((4L, 1L, false)))
    // null status impossible here; 'Z' fails
    assert(got("accepted_values:status") === ((4L, 1L, false)))
    // -5 and 999 out of range
    assert(got("in_range:price") === ((4L, 2L, false)))
    // 'bad' fails; NULL prio does NOT fail (pair with not_null to assert)
    assert(got("matches_regex:prio") === ((4L, 1L, false)))
  }

  test("all-green suite reports passed = true") {
    val df = Seq((1L, "A"), (2L, "B")).toDF("k", "s")
    val got = Expectations.run(df,
        Seq(Expectations.notNull("k"), Expectations.unique(Seq("k"))))
      .select("passed").as[Boolean].collect()
    assert(got.forall(identity))
  }

  test("cumulativeDistinct counts first-seen keys once") {
    val df = Seq(("u1", 1L), ("u2", 1L), ("u1", 2L), ("u3", 3L),
      ("u1", 3L), ("u2", 3L)).toDF("k", "t")
    val got = Windows.cumulativeDistinct(df, "k", "t")
      .select("tick", "n_active", "n_new", "n_cum")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L, 2L, 2L), (2L, 1L, 0L, 2L),
      (3L, 3L, 1L, 3L)))
  }

  test("timeDecayCredit floors exact integer credits on the micro grid") {
    // touches at age 0 and exactly one halflife before a 100-cent
    // conversion: weights 1e6 and 5e5 → credits ⌊100·2/3⌋, ⌊100·1/3⌋
    val base = java.sql.Timestamp.valueOf("2024-01-02 00:00:00")
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val ev = Seq(
      ("u", t0, "view", 0L), ("u", base, "click", 0L),
      ("u", base, "purchase", 100L)).toDF("user", "ts", "etype", "cents")
    val got = Attribution.timeDecayCredit(ev, "user", "ts", "etype",
        "cents", Seq("view", "click"), "purchase",
        lookbackSec = 172800L, halflifeSec = 86400L)
      .select("channel", "credit").as[(String, Long)].collect().toMap
    assert(got === Map("click" -> 66L, "view" -> 33L))
  }
}
