package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Linkage
import graft.ops.Linkage.FieldModel

/** Fellegi–Sunter scoring: hand-computed weights, the null-evidence
  * contract, threshold classification on the exact integer score, and
  * the model-validity guards.
  */
class LinkageSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def micro(x: Double): Long =
    BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("score is the exact micro-ln sum of per-field agreement weights") {
    val pairs = Seq(
      (1L, true, true),    // both agree
      (2L, true, false),   // split
      (3L, false, false)). // both disagree
      toDF("pair", "f1", "f2")
    val fields = Seq(
      FieldModel("f1", col("f1"), 0.9, 0.3),
      FieldModel("f2", col("f2"), 0.8, 0.1))
    val got = Linkage.scorePairs(pairs, fields)
      .select("pair", "score_micro").as[(Long, Long)].collect().toMap
    val (a1, d1) = (micro(math.log(0.9 / 0.3)), micro(math.log(0.1 / 0.7)))
    val (a2, d2) = (micro(math.log(0.8 / 0.1)), micro(math.log(0.2 / 0.9)))
    assert(got(1L) === a1 + a2)
    assert(got(2L) === a1 + d2)
    assert(got(3L) === d1 + d2)
    // the exposed weights are the same constants the scorer uses
    assert(Linkage.weightsMicro(0.9, 0.3) === ((a1, d1)))
  }

  test("null agreement is agnostic evidence (weight 0), not disagreement") {
    val pairs = Seq(
      (1L, Some(true)), (2L, Some(false)), (3L, Option.empty[Boolean]))
      .toDF("pair", "f1")
    val fields = Seq(FieldModel("f1", col("f1"), 0.9, 0.3))
    val got = Linkage.scorePairs(pairs, fields)
      .select("pair", "score_micro").as[(Long, Long)].collect().toMap
    assert(got(1L) === micro(math.log(3.0)))
    assert(got(2L) === micro(math.log(0.1 / 0.7)))
    assert(got(3L) === 0L)
  }

  test("classification compares on the integer micro score at exact thresholds") {
    val pairs = Seq((1L, true), (2L, false)).toDF("pair", "f1")
    val fields = Seq(FieldModel("f1", col("f1"), 0.9, 0.3))
    val wa = micro(math.log(3.0)) // 1098612
    // upper EXACTLY the agreement weight: >= is inclusive → match
    val got = Linkage.classifyPairs(pairs, fields,
        upper = wa / 1e6, lower = -10.0)
      .select("pair", "verdict").as[(Long, String)].collect().toMap
    assert(got(1L) === "match")
    assert(got(2L) === "possible")
  }

  test("model guards: m must exceed u, probabilities in (0,1), names unique") {
    intercept[IllegalArgumentException](Linkage.weightsMicro(0.3, 0.9))
    intercept[IllegalArgumentException](Linkage.weightsMicro(1.0, 0.5))
    val df = Seq((1L, true)).toDF("pair", "f1")
    intercept[IllegalArgumentException] {
      Linkage.scorePairs(df, Seq(
        FieldModel("x", col("f1"), 0.9, 0.3),
        FieldModel("x", col("f1"), 0.8, 0.1)))
    }
    intercept[IllegalArgumentException] {
      Linkage.classifyPairs(df,
        Seq(FieldModel("x", col("f1"), 0.9, 0.3)), upper = 1.0, lower = 2.0)
    }
  }
}
