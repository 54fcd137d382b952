package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Walks

/** Deterministic hash-argmin walks: exact agreement with an in-memory
  * replay of the md5-argmin rule, dead-end termination, seed isolation.
  */
class WalksSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def md5h(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
  }

  /** In-memory replay of the walk rule over an adjacency map. */
  private def replay(adj: Map[Long, Seq[Long]], seed: Long,
                     steps: Int): Seq[(Long, Long)] = {
    var cur = seed
    var out = Vector(0L -> seed)
    var s = 1
    var alive = true
    while (s <= steps && alive) {
      adj.get(cur).filter(_.nonEmpty) match {
        case Some(nbrs) =>
          cur = nbrs.map(v => (md5h(s"$s:$cur:$v"), v)).min._2
          out :+= (s.toLong -> cur)
        case None => alive = false
      }
      s += 1
    }
    out
  }

  test("walks match the in-memory md5-argmin replay exactly") {
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L),
      (2L, 1L), (2L, 3L),
      (3L, 1L), (3L, 2L), (3L, 4L),
      (4L, 1L), (4L, 3L)).toDF("src", "dst")
    val adj = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 1L), (2L, 3L),
      (3L, 1L), (3L, 2L), (3L, 4L), (4L, 1L), (4L, 3L))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val seeds = Seq(1L, 2L, 4L).toDF("id")
    val got = Walks.walks(edges, "src", "dst", seeds, "id", steps = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exp = Seq(1L, 2L, 4L).flatMap { seed =>
      replay(adj, seed, 5).map { case (step, node) => (seed, step, node) }
    }.toSet
    assert(got === exp)
  }

  test("a walk hitting a sink stops emitting") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst") // 3 is a sink
    val seeds = Seq(1L).toDF("id")
    val got = Walks.walks(edges, "src", "dst", seeds, "id", steps = 5)
      .orderBy("step")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((0L, 1L), (1L, 2L), (2L, 3L)))
  }

  test("a seed with no out-edges emits only step 0") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val seeds = Seq(9L).toDF("id")
    val got = Walks.walks(edges, "src", "dst", seeds, "id", steps = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((9L, 0L, 9L)))
  }

  test("reruns are bit-identical (no RNG state)") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val seeds = Seq(1L, 2L, 3L).toDF("id")
    def run() = Walks.walks(edges, "src", "dst", seeds, "id", steps = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run() === run())
  }
}
