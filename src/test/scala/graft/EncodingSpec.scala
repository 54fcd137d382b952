package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Encoding, Profile}

/** Encoding + profiling additions: smoothed target encoding as an
  * exact rational, deterministic dictionary codes, mask skeletons,
  * and type-inference classes.
  */
class EncodingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("target encoding: exact rational, pulls rare categories to the prior") {
    // a: 2 rows sum 1000; b: 1 row sum 10000; global G=11000, N=3
    val df = Seq(("a", 400L), ("a", 600L), ("b", 10000L))
      .toDF("cat", "cents")
    val got = Encoding.targetEncode(df, "cat", "cents", alpha = 2L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    // enc(a) = (1000·3 + 2·11000) / (3·(2+2)) = 25000/12 = 2083
    assert(got("a") === ((2L, 1000L, 25000L / 12L)))
    // enc(b) = (10000·3 + 2·11000) / (3·(1+2)) = 52000/9 = 5777
    assert(got("b") === ((1L, 10000L, 52000L / 9L)))
    // alpha → ∞ pushes both toward the global mean 3666; alpha 0 is
    // the raw per-category mean
    val raw = Encoding.targetEncode(df, "cat", "cents", alpha = 0L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(raw("a") === 500L && raw("b") === 10000L)
  }

  test("dictionary codes: frequency order, lexical tiebreak, dense from 0") {
    val df = Seq("x", "y", "y", "z", "z").toDF("cat")
    val got = Encoding.dictEncode(df, "cat")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // y and z tie at 2 → lexical order decides; x last
    assert(got === Map("y" -> ((2L, 0L)), "z" -> ((2L, 1L)),
      "x" -> ((1L, 2L))))
  }

  test("mask profile: skeletons + run collapse, nulls as empty mask") {
    val df = Seq(("Customer#000000001", "FURNITURE"),
        ("Customer#000000002", null),
        ("ab12", "AUTOMOBILE"))
      .toDF("name", "seg")
    val got = Profile.maskProfile(df, Seq("name", "seg"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    assert(got.contains(("name", "Aaaaaaaa#999999999", "Aa#9", 2L)))
    assert(got.contains(("name", "aa99", "a9", 1L)))
    assert(got.contains(("seg", "AAAAAAAAA", "A", 1L)))
    assert(got.contains(("seg", "AAAAAAAAAA", "A", 1L)))
    assert(got.contains(("seg", "", "", 1L)))
  }

  test("zScale: exact-moment z-scores, degenerate groups null") {
    val df = Seq(("a", 10L), ("a", 20L), ("a", 30L), ("b", 7L),
        ("c", 5L), ("c", 5L))
      .toDF("g", "v")
    val got = graft.ops.Normalize.zScale(df, "g", "v")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) null else r.getDouble(2).asInstanceOf[AnyRef]))
      .toMap
    // group a: mean 20, sd_pop = sqrt(200/3); z(10) = -10/8.1649...
    assert(got(("a", 20L)) === 0.0)
    assert(math.abs(got(("a", 10L)).asInstanceOf[Double] + 1.224745) < 1e-6)
    assert(math.abs(got(("a", 30L)).asInstanceOf[Double] - 1.224745) < 1e-6)
    // singleton group and zero-variance group → null
    assert(got(("b", 7L)) === null && got(("c", 5L)) === null)
  }

  test("type inference: first-match class order, trim, empty/null") {
    val df = Seq("42", "-7", "3.14", ".5", "2024-01-31", "TRUE", "false",
        " 19 ", "", null, "word", "12a")
      .toDF("v")
    val got = Profile.inferTypes(df, Seq("v"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(got === Map("int" -> 3L, "decimal" -> 2L, "date" -> 1L,
      "bool" -> 2L, "empty" -> 2L, "string" -> 2L))
  }
}
