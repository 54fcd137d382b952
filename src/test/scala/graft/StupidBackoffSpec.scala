package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.StupidBackoff

/** Stupid Backoff n-gram scoring: the position stream's context
  * construction, each back-off level's ratio and penalty against
  * hand-computed values, OOV handling, and the split/aggregate
  * contract of heldoutDocScores.
  */
class StupidBackoffSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def nano(x: Double): Long = math.round(math.log(x) * 1e9)

  test("positions: 1-based index, contexts null at the document start") {
    val docs = Seq((1L, "a b c"), (2L, "x"), (3L, " ")).toDF("doc_id", "text")
    val p = StupidBackoff.positions(docs, "doc_id", "text")
      .orderBy("doc_id", "i")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        Option(r.getString(3)), Option(r.getString(4))))
    assert(p.toSeq === Seq(
      (1L, 1, "a", None, None),
      (1L, 2, "b", Some("a"), None),
      (1L, 3, "c", Some("b"), Some("a")),
      (2L, 1, "x", None, None)))
  }

  test("scorePositions: trigram hit, bigram back-off, unigram back-off, OOV") {
    // train: "a b c" twice and "a b d" once ->
    //   c3(a,b,c)=2, c3(a,b,d)=1, c2(a,b)=3, c2(b,c)=2, c2(b,d)=1,
    //   c1(a)=3, c1(b)=3, c1(c)=2, c1(d)=1; N=9, V=4
    val train = StupidBackoff.positions(
      Seq((1L, "a b c"), (2L, "a b c"), (3L, "a b d")).toDF("doc_id", "text"),
      "doc_id", "text")
    // heldout: "a b c" -> uni(a), bi(a b), tri(a b c)
    //          "c b c" -> uni(c), bi? c2(c,b) absent -> 0.4*uni(b),
    //                     tri? c3(c,b,c) absent, c2(b,c)=2 present -> 0.4*c2/c1(b)
    //          "z"     -> OOV unigram: (0+1)/(N+V)
    val held = StupidBackoff.positions(
      Seq((10L, "a b c"), (11L, "c b c"), (12L, "z")).toDF("doc_id", "text"),
      "doc_id", "text")
    val got = StupidBackoff.scorePositions(train, held)
      .orderBy("doc_id", "i")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("i"),
        r.getAs[Int]("lvl"), r.getAs[Long]("lp_nano")))
    val n = 9.0; val v = 4.0
    assert(got.toSeq === Seq(
      (10L, 1, 1, nano(1.0 * ((3.0 + 1.0) / (n + v)))), // uni(a), no penalty
      (10L, 2, 2, nano(1.0 * (3.0 / 3.0))),             // bi(a b) = 3/3
      (10L, 3, 3, nano(2.0 / 3.0)),                      // tri = c3/c2p = 2/3
      (11L, 1, 1, nano(1.0 * ((2.0 + 1.0) / (n + v)))), // uni(c)
      (11L, 2, 1, nano(0.4 * ((3.0 + 1.0) / (n + v)))), // no c2(c,b) -> 0.4*uni(b)
      (11L, 3, 2, nano(0.4 * (2.0 / 3.0))),             // no c3 -> 0.4*c2(b,c)/c1(b)
      (12L, 1, 1, nano(1.0 * ((0.0 + 1.0) / (n + v)))))) // OOV add-one
  }

  test("heldoutDocScores: pmod-5 split, zero row for tokenless held-out docs") {
    // ids 0,5,10 held out; 5 has no tokens
    val docs = Seq((0L, "a b"), (5L, "  "), (10L, "a b"),
      (1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val got = StupidBackoff.heldoutDocScores(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // train: "a b","a b","a c" -> c1(a)=3,c1(b)=2,c1(c)=1; c2(a,b)=2,
    // c2(a,c)=1; N=6, V=3. held "a b": uni(a)=(3+1)/9, bi=2/3
    val expect = nano((3.0 + 1.0) / 9.0) + nano(2.0 / 3.0)
    assert(got.toSeq === Seq(
      (0L, 2L, 0L, 1L, 1L, expect),
      (5L, 0L, 0L, 0L, 0L, 0L),
      (10L, 2L, 0L, 1L, 1L, expect)))
  }

  test("scorePositions: partitioning-invariant (BIGINT sums, no float accumulation)") {
    val base = (0L until 40L).map(i =>
      (i, s"w${i % 7} w${(i + 1) % 7} w${(i + 2) % 7} w${i % 5}"))
    val docs = base.toDF("doc_id", "text")
    val a = StupidBackoff.heldoutDocScores(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq)
    val b = StupidBackoff.heldoutDocScores(docs.repartition(13), "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }
}
