package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Fingerprint

/** Order-invariant table fingerprints: partitioning/order never change
  * the sum, any single-value change does, null is distinct from the
  * string "null", and diffSlices pinpoints the divergent slice.
  */
class FingerprintSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def base = Seq(
    (1, 10, Some("a")), (1, 11, Some("b")), (2, 20, Some("c")),
    (2, 21, None), (3, 30, Some("e"))).toDF("slice", "k", "v")

  private def fps(df: org.apache.spark.sql.DataFrame) =
    Fingerprint.sliceFingerprints(df, col("slice"),
      Seq(col("k"), col("v")))

  test("fingerprint is order- and partitioning-invariant") {
    val a = fps(base).orderBy("slice").collect().toSeq
    val b = fps(base.orderBy(col("k").desc).repartition(7))
      .orderBy("slice").collect().toSeq
    assert(a === b)
  }

  test("a single changed value moves exactly its slice's hash_sum") {
    val changed = base.withColumn("v",
      when(col("k") === 20, lit("CHANGED")).otherwise(col("v")))
    val d = Fingerprint.diffSlices(fps(base), fps(changed)).collect()
    assert(d.length === 1)
    assert(d(0).getInt(0) === 2 && d(0).getString(1) === "content_diff")
    assert(d(0).getLong(2) === 2L && d(0).getLong(3) === 2L)
  }

  test("null and the string \"null\" fingerprint differently") {
    val withNull = Seq((1, 1, None: Option[String])).toDF("slice", "k", "v")
    val withStr = Seq((1, 1, Some("null"))).toDF("slice", "k", "v")
    val hn = fps(withNull).select("hash_sum").collect()(0).getLong(0)
    val hs = fps(withStr).select("hash_sum").collect()(0).getLong(0)
    assert(hn !== hs)
  }

  test("diffSlices tags one-sided slices; identical frames diff empty") {
    assert(Fingerprint.diffSlices(fps(base), fps(base)).count() === 0)
    val d = Fingerprint.diffSlices(fps(base),
        fps(base.where(col("slice") =!= 3)))
      .collect()
    assert(d.length === 1)
    assert(d(0).getInt(0) === 3 && d(0).getString(1) === "only_a")
    // a dropped ROW (same slice surviving) is a content diff with counts
    val d2 = Fingerprint.diffSlices(fps(base),
        fps(base.where(col("k") =!= 11)))
      .collect()
    assert(d2.length === 1 && d2(0).getString(1) === "content_diff")
    assert(d2(0).getLong(2) === 2L && d2(0).getLong(3) === 1L)
  }

  test("whole-table fingerprint is one row with the total count") {
    val r = Fingerprint.tableFingerprint(base, Seq(col("k"), col("v")))
      .collect()
    assert(r.length === 1 && r(0).getLong(0) === 5L)
  }
}
