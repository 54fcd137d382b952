package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.SubstringDedup

/** Substring-dedup semantics: cross-document w-gram spans merge into
  * maximal islands; in-document repetition alone never flags; clean
  * documents report zero with the right denominator.
  */
class SubstringDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "a b c d e f g h"),        // shares "a b c d e" with doc 2
    (2L, "x y a b c d e z"),
    (3L, "p q r s t u v w"),        // clean
    (4L, "m n o m n o m n o"),      // internal repetition ONLY
    (5L, "a b c q q q q q c d e f") // two dup regions, far apart
  ).toDF("doc_id", "text")

  test("shared w-gram runs merge into one maximal span per side") {
    val spans = SubstringDedup.dupSpans(docs.where(col("doc_id") <= 3),
        "doc_id", "text", w = 3, minDocs = 2)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 1: trigram positions 1,2,3 ("a b c","b c d","c d e") → tokens 1..5
    // doc 2: positions 3,4,5 → tokens 3..7; doc 3: nothing
    assert(spans.toSeq === Seq((1L, 1L, 5L, 5L), (2L, 3L, 7L, 5L)))
  }

  test("in-document repetition does not flag (distinct-doc gate)") {
    val spans = SubstringDedup.dupSpans(
      docs.where(col("doc_id").isin(3L, 4L)), "doc_id", "text",
      w = 3, minDocs = 2)
    assert(spans.count() === 0)
  }

  test("regions farther apart than w stay separate islands") {
    val spans = SubstringDedup.dupSpans(docs, "doc_id", "text",
        w = 3, minDocs = 2)
      .where(col("doc_id") === 5L).orderBy("span_start")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // doc 5 shares "a b c" (pos 1), then "c d e"+"d e f" (pos 9, 10 —
    // overlapping windows merge) — the regions sit 8 > w apart
    assert(spans.length === 2)
    assert(spans(0) === ((1L, 3L)) && spans(1) === ((9L, 12L)))
  }

  test("dupStats covers clean docs with zero and exact ratios") {
    val stats = SubstringDedup.dupStats(docs.where(col("doc_id") <= 3),
        "doc_id", "text", w = 3, minDocs = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(stats.toSeq === Seq(
      (1L, 8L, 5L, 0.625), (2L, 8L, 5L, 0.625), (3L, 8L, 0L, 0.0)))
  }

  test("minDocs above the sharing degree suppresses the span") {
    val spans = SubstringDedup.dupSpans(docs.where(col("doc_id") <= 2),
      "doc_id", "text", w = 3, minDocs = 3)
    assert(spans.count() === 0)
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("firstOccurrenceRebuild keeps the first occurrence, removes later ones") {
    val d = Seq(
      (1L, "a b c d e f"),       // first occurrence of "a b c" — kept whole
      (2L, "x a b c y z"),       // later occurrence → tokens 2..4 removed
      (3L, "p q r s t u")).toDF("doc_id", "text")
    val got = SubstringDedup.firstOccurrenceRebuild(d, "doc_id", "text", w = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    assert(got(0) === ((1L, 6L, 0L, 6L, md5hex("a b c d e f"))))
    assert(got(1) === ((2L, 6L, 3L, 3L, md5hex("x y z"))))
    assert(got(2) === ((3L, 6L, 0L, 6L, md5hex("p q r s t u"))))
  }

  test("firstOccurrenceRebuild removes IN-DOCUMENT repeats (unlike dupSpans)") {
    val d = Seq((1L, "m n o m n o m n o")).toDF("doc_id", "text")
    val got = SubstringDedup.firstOccurrenceRebuild(d, "doc_id", "text", w = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    // first "m n o" (pos 1..3) kept; later 3-gram occurrences start at
    // pos 4 and 7, marking 4..9 — merged into one span
    assert(got.head === ((9L, 6L, 3L, md5hex("m n o"))))
  }

  test("firstOccurrenceRebuild: fully-removed doc digests md5('')") {
    val d = Seq(
      (1L, "a b c d"),
      (2L, "a b c d")).toDF("doc_id", "text") // doc 2 entirely a later copy
    val got = SubstringDedup.firstOccurrenceRebuild(d, "doc_id", "text", w = 4)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getString(4)))
    assert(got(0) === ((1L, 4L, md5hex("a b c d"))))
    assert(got(1) === ((2L, 0L, md5hex(""))))
  }
}
