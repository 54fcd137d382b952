package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Similarity

/** Hard-negative mining: the cosine band contract (inclusive edges on
  * the rounded similarity), fingerprint exclusion, self exclusion,
  * and ranking determinism.
  */
class HardNegativesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // axis-aligned unit vectors mixed to land exact cosines: (1,0) vs
  // (cos t, sin t) has cosine cos t
  private def vec(x: Double, y: Double) = Array(x.toFloat, y.toFloat)

  test("band, self and fingerprint exclusions; rank by similarity then id") {
    val rows = Seq(
      (0L, vec(1, 0), "fpQ"),                    // the query
      (1L, vec(1, 0), "fpQ"),                    // cos 1.0, same fp -> excluded
      (2L, vec(1, 0), "fpX"),                    // cos 1.0 -> above band
      (3L, vec(0.4, math.sqrt(1 - 0.16)), "fpA"), // cos 0.4 -> in band
      (4L, vec(0.3, math.sqrt(1 - 0.09)), "fpB"), // cos 0.3 -> in band
      (5L, vec(0.4, -math.sqrt(1 - 0.16)), "fpC"), // cos 0.4 -> tie with 3
      (6L, vec(0.0, 1.0), "fpD"),                 // cos 0 -> below band
      (7L, vec(0.2, math.sqrt(1 - 0.04)), "fpQ")  // cos 0.2 but query's fp -> excluded
    ).toDF("vec_id", "embedding", "fp")
    val got = Similarity.hardNegatives(
        rows.where(col("vec_id") === 0), rows,
        rows.select(col("vec_id"), col("fp")),
        "vec_id", "vec_id", "embedding", "fp", k = 10, lo = 0.15, hi = 0.45)
      .collect().map(r => (r.getInt(r.fieldIndex("rank")),
        r.getLong(r.fieldIndex("neighbor_id"))))
    // in band: 3 (0.4), 5 (0.4), 4 (0.3); tie 3-vs-5 broken by id
    assert(got.toSeq === Seq((1, 3L), (2, 5L), (3, 4L)))
  }

  test("band edges: just-inside kept, just-outside dropped (float32 noise << margin)") {
    def at(c: Double) = vec(c, math.sqrt(1 - c * c))
    val rows = Seq(
      (0L, vec(1, 0), "q"),
      (1L, at(0.1501), "a"), // just inside lo
      (2L, at(0.1499), "b"), // just outside lo
      (3L, at(0.4499), "c"), // just inside hi
      (4L, at(0.4501), "d")  // just outside hi
    ).toDF("vec_id", "embedding", "fp")
    val got = Similarity.hardNegatives(
        rows.where(col("vec_id") === 0), rows,
        rows.select(col("vec_id"), col("fp")),
        "vec_id", "vec_id", "embedding", "fp", k = 10, lo = 0.15, hi = 0.45)
      .collect().map(_.getLong(2)).sorted
    assert(got.toSeq === Seq(1L, 3L))
  }
}
