package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.PageRank

/** PageRank: parity with a dense in-memory power iteration, mass
  * conservation under dangling nodes, and the convergence contract.
  */
class PageRankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // A→B, A→C, B→C, C→A, D→C, C→E; E is dangling (no out-edges)
  private val edgeList = Seq(
    (0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L), (3L, 2L), (2L, 4L))

  /** Dense reference: same damped scheme with uniform dangling
    * redistribution, iterated far past the distributed tol.
    */
  private def dense(edges: Seq[(Long, Long)], d: Double, iters: Int): Map[Long, Double] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size
    val idx = nodes.zipWithIndex.toMap
    val out = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var r = Array.fill(n)(1.0 / n)
    (1 to iters).foreach { _ =>
      val dangling = nodes.filterNot(out.contains).map(v => r(idx(v))).sum
      val next = Array.fill(n)((1.0 - d) / n + d * dangling / n)
      edges.foreach { case (u, v) =>
        next(idx(v)) += d * r(idx(u)) / out(u)
      }
      r = next
    }
    nodes.map(v => v -> r(idx(v))).toMap
  }

  test("ranks match the dense power iteration; mass conserved; hub ranks highest") {
    val got = PageRank.ranks(edgeList.toDF("s", "d"), "s", "d")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = dense(edgeList, 0.85, 200)
    assert(got.keySet === want.keySet)
    got.foreach { case (v, r) =>
      assert(math.abs(r - want(v)) < 1e-6, s"node $v: $r vs ${want(v)}")
    }
    // dangling redistribution keeps total mass at 1
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    // C (node 2) collects from A, B, D — the authority
    assert(got(2L) === got.values.max)
  }

  test("non-convergence throws instead of returning half-iterated ranks") {
    intercept[IllegalStateException] {
      PageRank.ranks(edgeList.toDF("s", "d"), "s", "d",
        maxIter = 1, tol = 1e-12)
    }
  }

  test("fixed-point ranks track the dense double iteration at the same depth") {
    val iters = 3
    val unit = 1000000000000L
    val got = PageRank.ranksFixedPoint(edgeList.toDF("s", "d"), "s", "d",
        iters = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = dense(edgeList, 0.85, iters)
    assert(got.keySet === want.keySet)
    // floor divisions leak only O(units): relative parity with the
    // double recurrence is ~1e-12-per-op, far inside 1e-9
    got.foreach { case (v, r) =>
      assert(math.abs(r.toDouble / unit - want(v)) < 1e-9,
        s"node $v: ${r.toDouble / unit} vs ${want(v)}")
    }
    // floors only ever LOSE mass, and at most a few units per node per
    // round — total stays just under one unit of rank
    val mass = got.values.sum
    assert(mass <= unit)
    assert(mass > unit - 100L * got.size * iters)
  }

  test("fixed-point is deterministic run-to-run") {
    val df = edgeList.toDF("s", "d")
    val a = PageRank.ranksFixedPoint(df, "s", "d", iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = PageRank.ranksFixedPoint(df, "s", "d", iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
  }
}
