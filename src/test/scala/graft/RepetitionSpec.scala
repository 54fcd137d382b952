package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Repetition

/** Gopher-style n-gram repetition signals against hand-computed masses.
  * Definitions under test (Repetition.scala): per (doc, n), gram count c
  * and char length L; top = (cMax · lenOfLongestMaxCountGram) / M;
  * dup = sum of c·L over grams with c ≥ 2, / M; M = total c·L.
  */
class RepetitionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sigs(rows: Seq[(Long, String)]) =
    Repetition.signals(rows.toDF("doc_id", "text"), "doc_id", "text",
        topNs = Seq(2, 3), dupNs = Seq(2))
      .orderBy("doc_id").collect()

  test("looped phrase: hand-computed top and dup fractions") {
    // "a b a b a b": 2-grams "a b"×3 (L=3), "b a"×2 (L=3) → M=15,
    // top=9/15=0.6, dup=15/15=1.0; 3-grams "a b a"×2, "b a b"×2 (L=5)
    // → M=20, top=10/20=0.5
    val Array(r) = sigs(Seq((1L, "a b a b a b")))
    assert(r.getAs[Long]("n_tokens") === 6L)
    assert(r.getAs[Double]("top_2gram_frac") === 0.6)
    assert(r.getAs[Double]("top_3gram_frac") === 0.5)
    assert(r.getAs[Double]("dup_2gram_frac") === 1.0)
  }

  test("no repetition: dup mass 0, top is the largest single gram share") {
    // "aaa b c aaa": 2-grams "aaa b"(5) "b c"(3) "c aaa"(5), all c=1 →
    // M=13, dup=0, top picks the LONGEST tie → 5/13
    val Array(r) = sigs(Seq((1L, "aaa b c aaa")))
    assert(r.getAs[Double]("dup_2gram_frac") === 0.0)
    assert(r.getAs[Double]("top_2gram_frac") === math.rint(5.0 / 13.0 * 1e6) / 1e6)
  }

  test("max-count ties break toward the longer gram") {
    // "zz zz q zz zz": 2-grams "zz zz"×2 (L=5), "zz q"(4), "q zz"(4) →
    // top c*=2, L*=5 → 10 / (10+4+4) = 10/18
    val Array(r) = sigs(Seq((1L, "zz zz q zz zz")))
    assert(r.getAs[Double]("top_2gram_frac") === math.rint(10.0 / 18.0 * 1e6) / 1e6)
  }

  test("docs shorter than n and empty docs carry zeros, not nulls") {
    val rs = sigs(Seq((1L, "solo"), (2L, "   "), (3L, "two tokens")))
    val byId = rs.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(1L).getAs[Long]("n_tokens") === 1L)
    assert(byId(1L).getAs[Double]("top_2gram_frac") === 0.0)
    assert(byId(1L).getAs[Double]("top_3gram_frac") === 0.0)
    assert(byId(2L).getAs[Long]("n_tokens") === 0L)
    assert(byId(2L).getAs[Double]("dup_2gram_frac") === 0.0)
    // exactly n tokens → one gram, top=1.0 (c=1, its whole mass)
    assert(byId(3L).getAs[Double]("top_2gram_frac") === 1.0)
    rs.foreach(r => r.toSeq.foreach(v => assert(v != null, s"null in $r")))
  }

  test("one explode pass serves every n: a single generate in the plan") {
    val df = Repetition.signals(
      Seq((1L, "a b c")).toDF("doc_id", "text"), "doc_id", "text",
      topNs = Seq(2, 3, 4), dupNs = Seq(5, 6))
    // optimized logical plan: no AQE wrapper to hide nodes from collect
    val generates = df.queryExecution.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(generates.size === 1,
      s"all n values must share one explode, found ${generates.size}")
  }
}
