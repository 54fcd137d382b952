package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Communities

/** Exact-integer modularity: textbook values on perfect communities,
  * accounting identities, and agreement with a direct recomputation
  * from the labeling.
  */
class ModularitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("two disjoint triangles score exactly Q = 1/2") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (4L, 5L), (5L, 6L), (6L, 4L)).toDF("src", "dst")
    val got = Communities.modularity(edges, "src", "dst", iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.length === 2)
    // E = 12 directed rows; each triangle: intra_dir 6, degree 6
    got.foreach { case (_, n, intra, deg, qnum) =>
      assert(n === 3L); assert(intra === 3L); assert(deg === 6L)
      assert(qnum === 12L * 6L - 36L)
    }
    val e = 12L
    assert(got.map(_._5).sum.toDouble / (e * e) === 0.5)
  }

  test("accounting identities and agreement with a direct recomputation") {
    // two dense blobs plus a bridge — LPA labels whatever it labels;
    // the identities must hold regardless
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L),
      (4L, 5L), (4L, 6L), (5L, 6L), (6L, 7L), (7L, 5L)).toDF("src", "dst")
    val labels = Communities.labelPropagation(edges, "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sym = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L),
      (4L, 6L), (5L, 6L), (6L, 7L), (7L, 5L))
      .flatMap { case (a, b) => Seq(a -> b, b -> a) }.distinct
      .filter { case (a, b) => a != b }
    val e = sym.size.toLong
    val exp = sym.groupBy { case (a, _) => labels(a) }.map { case (lab, rows) =>
      val deg = rows.size.toLong
      val intra = rows.count { case (a, b) => labels(a) == labels(b) }.toLong
      val n = labels.count(_._2 == lab).toLong
      (lab, n, intra / 2, deg, e * intra - deg * deg)
    }.toSet
    val got = Communities.modularity(edges, "src", "dst", iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got === exp)
    // identities: Σ degree_sum = E, Σ intra_pairs ≤ E/2
    assert(got.toSeq.map(_._4).sum === e)
    assert(got.toSeq.map(_._3).sum <= e / 2)
  }
}
