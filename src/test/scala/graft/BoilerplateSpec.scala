package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Boilerplate

/** Cross-document boilerplate-line removal: commonality counting,
  * stripping, order-preserving reassembly, and edge cases (all-boilerplate
  * docs, blank lines, whitespace variants).
  */
class BoilerplateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val chrome = "accept cookies to continue"
  private val footer = "copyright example corp all rights reserved"
  private val docs = Seq(
    (0L, s"$chrome\nunique first article body\n$footer"),
    (1L, s"$chrome\ndifferent second article text\n$footer"),
    (2L, s"$chrome  \nthird body line one\nthird body line two\n$footer"),
    (3L, s"$chrome\n$footer"), // nothing but boilerplate
    (4L, "standalone document with no shared lines at all")
  ).toDF("doc_id", "text")

  test("commonLineKeys finds lines shared by >= minDocs distinct docs") {
    val lines = Boilerplate.lineTable(docs, "doc_id", "text")
    val common2 = Boilerplate.commonLineKeys(lines, minDocs = 2).collect()
    assert(common2.length === 2) // chrome + footer
    // at minDocs = 5 nothing is common
    assert(Boilerplate.commonLineKeys(lines, minDocs = 5).count() === 0L)
  }

  test("stripBoilerplate drops common lines and preserves order") {
    val out = Boilerplate.stripBoilerplate(docs, "doc_id", "text", minDocs = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(0L) === ((3L, 1L, "unique first article body")))
    assert(out(1L) === ((3L, 1L, "different second article text")))
    // multi-line remainder keeps original line order
    assert(out(2L) === ((4L, 2L, "third body line one\nthird body line two")))
    // all-boilerplate doc survives as an empty row, not a dropped row
    assert(out(3L) === ((2L, 0L, "")))
    // untouched doc round-trips
    assert(out(4L) === ((1L, 1L, "standalone document with no shared lines at all")))
  }

  test("trailing-whitespace variants of a line match; blank lines never strip") {
    // doc 2's chrome line carries trailing spaces and still matched above;
    // now: blank lines appear in every doc but must survive
    val blanky = Seq(
      (0L, "alpha\n\nbeta"),
      (1L, "gamma\n\ndelta"),
      (2L, "epsilon\n\nzeta")
    ).toDF("doc_id", "text")
    val out = Boilerplate.stripBoilerplate(blanky, "doc_id", "text", minDocs = 2)
      .orderBy("doc_id").collect()
    assert(out.map(_.getString(3)).toSeq ===
      Seq("alpha\n\nbeta", "gamma\n\ndelta", "epsilon\n\nzeta"))
    assert(out.forall(r => r.getLong(1) === 3L && r.getLong(2) === 3L))
  }

  test("minDocs below 2 is rejected") {
    val lines = Boilerplate.lineTable(docs, "doc_id", "text")
    intercept[IllegalArgumentException] {
      Boilerplate.commonLineKeys(lines, minDocs = 1)
    }
  }
}
