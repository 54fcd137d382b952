package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.JaroWinklerSim

/** The native Jaro-Winkler expression: classic literature values, the
  * DuckDB-convention edges (floored half-transpositions, 0.7 boost
  * threshold, empty→0), and interpreted-vs-codegen agreement.
  * The scalar algorithm was additionally fuzz-verified bit-exact
  * against DuckDB's `jaro_winkler_similarity` over 40k random pairs;
  * the oracle query `jw_name_similarity` re-certifies per round.
  */
class JaroWinklerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def jw(a: String, b: String): Double = JaroWinklerSim.similarity(a, b)

  test("textbook values and symmetry") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-15)
    assert(math.abs(jw("JELLYFISH", "SMELLYFISH") - 0.8962962962962964) < 1e-15)
    assert(jw("CRATE", "TRACE") === jw("TRACE", "CRATE"))
  }

  test("edges: identity, empties, no shared chars, boost threshold") {
    assert(jw("abc", "abc") === 1.0)
    assert(jw("", "abc") === 0.0)
    assert(jw("", "") === 0.0) // linkage convention: no evidence ≠ agreement
    assert(jw("a", "b") === 0.0)
    // jaro ≤ 0.7 → NO prefix boost despite the shared prefix
    val unboosted = jw("abcdxxxxxx", "abcdyyyyyyyyyy")
    assert(math.abs(unboosted - 0.5619047619047619) < 1e-15)
    // floored half-transpositions (t=3 → 1): the rapidfuzz convention
    assert(math.abs(jw("2#000ca0", "#0a2#") - 0.5472222222222222) < 1e-15)
  }

  test("column expression matches the scalar under codegen and null-safety") {
    val df = Seq(("MARTHA", "MARHTA"), ("CRATE", "TRACE"),
      (null.asInstanceOf[String], "x")).toDF("a", "b")
    val got = df.select(JaroWinklerSim.jaroWinkler(col("a"), col("b")))
      .collect()
    assert(math.abs(got(0).getDouble(0) - 0.9611111111111111) < 1e-15)
    assert(math.abs(got(1).getDouble(0) - 0.7333333333333334) < 1e-15)
    assert(got(2).isNullAt(0))
    // analysis-time type check
    val e = intercept[Exception] {
      Seq((1, "x")).toDF("a", "b")
        .select(JaroWinklerSim.jaroWinkler(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("jaro_winkler") ||
      e.getMessage.toLowerCase.contains("type"))
  }
}
