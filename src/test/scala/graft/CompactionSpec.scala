package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Compaction, ZoneMaps}
import org.apache.spark.sql.functions._

/** Compaction binning invariants and zone-map skip behavior under
  * good vs bad layouts.
  */
class CompactionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("compaction: bytes conserved, oversize files isolated, bins near target") {
    val inv = Seq(
      ("p1", "big", 120000L), ("p1", "a", 30000L), ("p1", "b", 30000L),
      ("p1", "c", 20000L), ("p1", "d", 10000L),
      ("p2", "x", 1000L), ("p2", "y", 1000L))
      .toDF("part", "file", "bytes")
    val assign = Compaction.plan(inv, "part", "file", "bytes", 50000L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    // 120k file cuts at 0 → bin 0; next (a) starts at 120k → bin 2:
    // nothing shares the oversize file's bin
    assert(assign(("p1", "big")) === 0L)
    assert(!assign.exists { case ((p, f), b) =>
      p == "p1" && f != "big" && b == 0L })
    val summary = Compaction.planSummary(inv, "part", "file", "bytes", 50000L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // bytes conserved per partition
    assert(summary.filter(_._1._1 == "p1").values.map(_._2).sum === 210000L)
    assert(summary(("p2", 0L)) === ((2L, 2000L)))
    // small-file count collapses: p1 had 5 files → ≤ 4 bins
    assert(summary.count(_._1._1 == "p1") <= 4)
  }

  test("zone maps: sorted layout skips, shuffled layout reads everything") {
    val rows = (0 until 4096).map(i => ("p", i.toLong, (i * 2654435761L) % 4096))
    val df = rows.toDF("part", "v", "shuf")
    // layout sorted ON the predicate column: one-eighth slice reads ~1/8
    val sortedScore = ZoneMaps.skipScore(
      ZoneMaps.build(df, "part", "v", "v", 256), lit(0L), lit(511L))
      .head()
    assert(sortedScore.getAs[Long]("n_blocks") === 16L)
    assert(sortedScore.getAs[Long]("blocks_read") === 2L)
    // layout sorted on an unrelated key: every block straddles the
    // predicate range → zero skipping
    val shuffledScore = ZoneMaps.skipScore(
      ZoneMaps.build(df, "part", "shuf", "v", 256, statsCol = Some("v")),
      lit(0L), lit(511L)).head()
    assert(shuffledScore.getAs[Long]("blocks_read") === 16L)
    assert(shuffledScore.getAs[Long]("blocks_skipped") === 0L)
    // row accounting: rows_read covers at least the matching rows
    assert(sortedScore.getAs[Long]("rows_read") === 512L)
    assert(shuffledScore.getAs[Long]("rows_read") === 4096L)
  }
}
