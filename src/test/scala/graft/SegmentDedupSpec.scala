package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.SegmentDedup

/** CCNet-style segment dedup: segment slicing (ragged tail), the
  * corpus-wide first-occurrence keep rule, and the doc-grain edit
  * digest — all checked against hand-computed md5s.
  */
class SegmentDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("segments: non-overlapping w-token slices with ragged tail, empty docs skipped") {
    val docs = Seq(
      (1L, "a b c d e"),    // w=2 -> [a b][c d][e]
      (2L, "  x   y  "),    // whitespace-normalized -> [x y]
      (3L, "")              // no tokens -> no segments
    ).toDF("doc_id", "text")
    val got = SegmentDedup.segments(docs, "doc_id", "text", w = 2)
      .orderBy("doc_id", "seg_idx")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(got.toSeq === Seq(
      (1L, 0, md5hex("a b")), (1L, 1, md5hex("c d")), (1L, 2, md5hex("e")),
      (2L, 0, md5hex("x y"))))
  }

  test("keepFirst: exactly one keeper per fingerprint, lexicographic (doc, seg_idx) min") {
    // "p q" appears at (1,0), (1,1) [within-doc repeat] and (2,0);
    // only (1,0) survives. "r s" is unique.
    val docs = Seq(
      (1L, "p q p q"),
      (2L, "p q r s")).toDF("doc_id", "text")
    val marked = SegmentDedup.keepFirst(
        SegmentDedup.segments(docs, "doc_id", "text", w = 2), "doc_id")
      .orderBy("doc_id", "seg_idx")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(3)))
    assert(marked.toSeq === Seq(
      (1L, 0, true), (1L, 1, false), (2L, 0, false), (2L, 1, true)))
  }

  test("docStats: edited docs only, digest is kept fps in segment order; all-removed doc digests md5('')") {
    val docs = Seq(
      (1L, "p q r s"),  // both segments first occurrences -> not edited
      (2L, "p q x y"),  // loses seg 0 ("p q"), keeps "x y"
      (3L, "p q r s")   // exact copy of doc 1 -> loses everything
    ).toDF("doc_id", "text")
    val got = SegmentDedup.docStats(docs, "doc_id", "text", w = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq === Seq(
      (2L, 2L, 1L, md5hex(md5hex("x y"))),
      (3L, 2L, 2L, md5hex(""))))
  }

  test("doc order never affects the keep decision (total-order keeper, not arrival order)") {
    val base = Seq((7L, "k k k k"), (2L, "k k m m"), (9L, "k k z z"))
    val a = SegmentDedup.docStats(base.toDF("doc_id", "text"), "doc_id", "text", 2)
      .orderBy("doc_id").collect().toSeq
    val b = SegmentDedup.docStats(base.reverse.toDF("doc_id", "text").repartition(3),
        "doc_id", "text", 2)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
    // keeper for "k k" is doc 2 (the smallest doc_id), so 7 and 9 are edited
    assert(a.map(_.getLong(0)) === Seq(7L, 9L))
  }
}
