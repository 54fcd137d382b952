package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Retrieval

/** Hybrid retrieval: document-as-query BM25 and reciprocal-rank fusion,
  * checked against exact hand arithmetic (the nano contributions are
  * plain integer math for small ranks).
  */
class HybridRrfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def nano(rank: Int, kRrf: Int = 60): Long =
    math.floor(1e9 / (kRrf + rank)).toLong

  test("bm25DocQueries: self excluded, every query scores all term-sharing docs") {
    val docs = Seq(
      (0L, "apple banana"),
      (1L, "apple apple cherry"),
      (2L, "banana cherry"),
      (3L, "durian")).toDF("doc_id", "text")
    val got = Retrieval.bm25DocQueries(docs, "doc_id", "text",
        col("doc_id") === 0L, k = 10)
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // query 0 = {apple, banana}: doc 1 shares apple, doc 2 shares
    // banana, doc 3 shares nothing, doc 0 is self — so exactly {1, 2}
    // appear, and no rank exceeds the candidate count
    assert(got.map(_._3).toSet === Set(1L, 2L))
    assert(got.map(_._2).toSeq === Seq(1, 2))
    assert(got.forall(_._1 == 0L))
  }

  test("rrfFuse: both-list candidates sum both nano terms; single-list carry a null rank") {
    val dense = Seq((0L, 1, 10L), (0L, 2, 11L)).toDF("query_id", "rank", "doc_id")
    val lex = Seq((0L, 1, 11L), (0L, 2, 12L)).toDF("query_id", "rank", "doc_id")
    val got = Retrieval.rrfFuse(dense, lex, "doc_id", k = 10)
      .orderBy("rank")
      .collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Int]),
        Option(r.get(5)).map(_.asInstanceOf[Int])))
    // doc 11: dense rank 2 + lex rank 1 -> 1e9/62 + 1e9/61 (top)
    // doc 10: dense rank 1 only;  doc 12: lex rank 2 only (tie on
    // nano(2) broken by doc_id: 10 before 12? both nano(1) vs nano(2)…)
    val d11 = nano(2) + nano(1)
    val d10 = nano(1)
    val d12 = nano(2)
    assert(got.toSeq === Seq(
      (1, 11L, d11, Some(2), Some(1)),
      (2, 10L, d10, Some(1), None),
      (3, 12L, d12, None, Some(2))))
  }

  test("rrfFuse: exact ties in fused score break on candidate id") {
    val dense = Seq((0L, 1, 5L)).toDF("query_id", "rank", "doc_id")
    val lex = Seq((0L, 1, 3L)).toDF("query_id", "rank", "doc_id")
    val got = Retrieval.rrfFuse(dense, lex, "doc_id", k = 10)
      .orderBy("rank").collect().map(r => (r.getInt(1), r.getLong(2)))
    // both docs carry exactly nano(1): id 3 outranks id 5
    assert(got.toSeq === Seq((1, 3L), (2, 5L)))
  }
}
