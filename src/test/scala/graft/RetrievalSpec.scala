package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{LogOdds, Retrieval}

/** BM25 retrieval and Monroe log-odds characteristic terms:
  * hand-verified against the exact micro-unit arithmetic the operators
  * use (same expression order, same HALF_UP fixed-pointing).
  */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** The exact micro-unit BM25 contribution the operator assigns. */
  private def contrib(tf: Long, df: Long, dl: Long, n: Long, total: Long,
                      k1: Double = 1.2, b: Double = 0.75): Long = {
    val idf = math.log((n.toDouble - df.toDouble + 0.5) / (df.toDouble + 0.5) + 1.0)
    val denom = tf.toDouble + k1 *
      (1.0 - b + b * dl.toDouble * n.toDouble / total.toDouble)
    BigDecimal(idf * (tf.toDouble * (k1 + 1.0)) / denom * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
  }

  private def score6(micro: Long): Double =
    BigDecimal(micro.toDouble / 1e6)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("bm25: scores match the exact hand computation; non-matching docs absent") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "apple cherry"),
      (3L, "banana banana banana"),
      (4L, "cherry cherry")).toDF("doc_id", "text")
    val got = Retrieval.bm25TopDocs(docs, "doc_id", "text",
        Seq("apple", "banana"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // N=4, total_len=10; df(apple)=2, df(banana)=2
    val m1 = contrib(2, 2, 3, 4, 10) + contrib(1, 2, 3, 4, 10) // d1: apple×2, banana×1
    val m2 = contrib(1, 2, 2, 4, 10)                            // d2: apple×1
    val m3 = contrib(3, 2, 3, 4, 10)                            // d3: banana×3
    val want = Seq((1L, 2L, m1), (2L, 1L, m2), (3L, 1L, m3))
      .sortBy { case (id, _, m) => (-m, id) }
      .map { case (id, h, m) => (id, h, score6(m)) }
    assert(got.toSeq === want) // doc 4 (no query terms) never appears
  }

  test("bm25: k truncates after the (score desc, id) order; longer docs score lower") {
    val docs = Seq(
      (1L, "apple pad pad pad pad pad pad pad"),
      (2L, "apple")).toDF("doc_id", "text")
    val got = Retrieval.bm25TopDocs(docs, "doc_id", "text", Seq("apple"), k = 1)
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(2L)) // same tf, shorter doc wins on length normalization
  }

  /** The exact micro-unit z the operator assigns. */
  private def zMicro(ya: Long, yb: Long, na: Long, nb: Long, a0: Double): Long = {
    val aw = a0 * (ya.toDouble + yb.toDouble) / (na.toDouble + nb.toDouble)
    val delta =
      math.log((ya.toDouble + aw) / (na.toDouble + a0 - ya.toDouble - aw)) -
        math.log((yb.toDouble + aw) / (nb.toDouble + a0 - yb.toDouble - aw))
    val s2 = 1.0 / (ya.toDouble + aw) + 1.0 / (yb.toDouble + aw)
    BigDecimal(delta / math.sqrt(s2) * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
  }

  test("log-odds: counts exact, z matches hand computation, |z| ordering with term tiebreak") {
    val docs = Seq(
      (1L, "a", "x x x y"),
      (2L, "b", "z z z y")).toDF("doc_id", "grp", "text")
    val got = LogOdds.characteristicTerms(docs, "doc_id", "text",
        col("grp") === "a", alpha0 = 2.0, topK = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val zx = zMicro(3, 0, 4, 4, 2.0)
    val zz = zMicro(0, 3, 4, 4, 2.0)
    val zy = zMicro(1, 1, 4, 4, 2.0)
    assert(zx > 0 && zz < 0 && zy === 0L) // sign = which side the term marks
    assert(zx === -zz)                    // symmetric corpus → symmetric z, tie
    assert(got.toSeq === Seq(             // tie breaks on term: x before z
      ("x", 3L, 0L, score6(zx)),
      ("z", 0L, 3L, score6(zz)),
      ("y", 1L, 1L, score6(zy))))
  }
}
