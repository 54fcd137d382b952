package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Incremental

/** Incremental aggregate maintenance: the load-bearing property is
  * merge ≡ recompute — folding any partition of the rows through
  * partial states gives bit-identical results to one full aggregation —
  * plus the algebra that makes snapshots composable (associativity,
  * merged snapshots re-merge).
  */
class IncrementalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rows = Seq(
    ("a", 10L), ("a", -3L), ("a", 7L), ("b", 100L), ("b", 1L),
    ("c", 0L), ("a", 42L), ("b", -50L))

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[Row] =
    df.orderBy("k").collect().toSeq

  test("merge of split partials ≡ recompute over all rows") {
    val all = rows.toDF("k", "v")
    val full = Incremental.partial(all, Seq("k"), col("v"), "v")
    val (h1, h2) = rows.splitAt(3)
    val merged = Incremental.merge(Seq(
      Incremental.partial(h1.toDF("k", "v"), Seq("k"), col("v"), "v"),
      Incremental.partial(h2.toDF("k", "v"), Seq("k"), col("v"), "v")),
      Seq("k"), "v")
    assert(canon(merged) === canon(full))
  }

  test("merge is associative: merged snapshots re-merge to the same state") {
    val parts = rows.grouped(3).map(g =>
      Incremental.partial(g.toDF("k", "v"), Seq("k"), col("v"), "v")).toSeq
    val flat = Incremental.merge(parts, Seq("k"), "v")
    val nested = Incremental.merge(
      Seq(Incremental.merge(parts.take(2), Seq("k"), "v"), parts.last),
      Seq("k"), "v")
    assert(canon(nested) === canon(flat))
  }

  test("finish derives avg from state without touching the base rows") {
    val st = Incremental.partial(rows.toDF("k", "v"), Seq("k"), col("v"), "v")
    val avg = Incremental.finish(st, "v")
      .select("k", "avg_v").as[(String, Double)].collect().toMap
    assert(avg("a") === 14.0)   // (10 - 3 + 7 + 42) / 4
    assert(avg("b") === 17.0)   // (100 + 1 - 50) / 3
    assert(avg("c") === 0.0)
  }

  test("merge rejects a frame that is not a partial state of this shape") {
    val good = Incremental.partial(rows.toDF("k", "v"), Seq("k"), col("v"), "v")
    val bad = rows.toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Incremental.merge(Seq(good, bad), Seq("k"), "v")
    }
    assert(e.getMessage.contains("partial state columns"))
  }
}
