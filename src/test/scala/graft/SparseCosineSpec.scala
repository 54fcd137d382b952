package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Tfidf

/** Tfidf similarity/diagnostic operators: sparse cosine pairs
  * (hand-verified integer arithmetic, df-cap definition, identity
  * pair) and the Zipf fit on an exactly-Zipfian corpus.
  */
class SparseCosineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** The exact fixed-point weight the operator assigns. */
  private def w(tf: Long, df: Long, n: Long): Long =
    BigDecimal(tf.toDouble * math.log((n + 1.0) / (df + 1.0)) * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("two-doc cosine matches the exact integer-arithmetic hand computation") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "apple banana cherry"),
      (3L, "xyz xyz")).toDF("doc_id", "text")
    val got = Tfidf.sparseCosinePairs(docs, "doc_id", "text",
        maxDf = 2L, threshold = 0.01)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // only (1,2) shares a capped term; doc 3 never pairs
    assert(got.keySet === Set((1L, 2L)))
    val (wa1, wb1) = (w(2, 2, 3), w(1, 2, 3))          // d1: apple, banana
    val (wa2, wb2, wc2) = (w(1, 2, 3), w(1, 2, 3), w(1, 1, 3)) // d2
    val dot = BigInt(wa1) * wa2 + BigInt(wb1) * wb2
    val n1 = BigInt(wa1) * wa1 + BigInt(wb1) * wb1
    val n2 = BigInt(wa2) * wa2 + BigInt(wb2) * wb2 + BigInt(wc2) * wc2
    val want = BigDecimal(dot.toDouble /
        (math.sqrt(n1.toDouble) * math.sqrt(n2.toDouble)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got((1L, 2L)) === want)
  }

  test("identical documents score exactly 1.0") {
    val docs = Seq(
      (1L, "apple banana cherry"),
      (2L, "apple banana cherry"),
      (3L, "unrelated words here")).toDF("doc_id", "text")
    val got = Tfidf.sparseCosinePairs(docs, "doc_id", "text",
        maxDf = 3L, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got((1L, 2L)) === 1.0)
  }

  test("zipfFit recovers slope -1 on an exactly-Zipfian corpus") {
    // frequencies 12/r for ranks 1..4: ln f = ln 12 − ln r → slope −1,
    // up to the micro-unit rounding of the two ln grids (< 1e-5)
    val text = Seq.fill(12)("aa") ++ Seq.fill(6)("bb") ++
      Seq.fill(4)("cc") ++ Seq.fill(3)("dd")
    val docs = Seq((1L, text.mkString(" "))).toDF("doc_id", "text")
    val r = Tfidf.zipfFit(docs, "doc_id", "text", topK = 4)
      .select("n", "slope").as[(Long, Double)].head()
    assert(r._1 === 4L)
    assert(math.abs(r._2 - (-1.0)) < 1e-5, s"slope ${r._2}")
  }

  test("zipfFit is deterministic under frequency ties (term tiebreak)") {
    val docs = Seq((1L, "b b a a c c d")).toDF("doc_id", "text")
    val r1 = Tfidf.zipfFit(docs, "doc_id", "text", topK = 4)
      .select("slope").as[Double].head()
    val r2 = Tfidf.zipfFit(docs.repartition(7), "doc_id", "text", topK = 4)
      .select("slope").as[Double].head()
    assert(r1 === r2)
  }

  test("the df cap is definitional: ubiquitous terms influence nothing") {
    val withStop = Seq(
      (1L, "the apple banana"),
      (2L, "the apple cherry"),
      (3L, "the unrelated words")).toDF("doc_id", "text")
    val without = Seq(
      (1L, "apple banana"),
      (2L, "apple cherry"),
      (3L, "unrelated words")).toDF("doc_id", "text")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      Tfidf.sparseCosinePairs(df, "doc_id", "text", maxDf = 2L,
          threshold = 0.01)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // "the" has df 3 > maxDf 2 → dropped from weights AND norms, so the
    // two corpora are indistinguishable to the operator
    assert(pairs(withStop) === pairs(without))
  }
}
