package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.CdcChunks

/** Content-defined chunking: exact agreement with an in-memory replay
  * of the rolling-hash cut rule, shift robustness (the property fixed
  * segmentation lacks), and empty-doc handling.
  */
class CdcChunksSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val K = 3
  private val M = 8

  private def md5h(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
  }

  /** In-memory replay: chunk token-lists of one doc. */
  private def chunksOf(toks: Seq[String]): Seq[Seq[String]] = {
    val cuts = (1 to toks.size).map { i =>
      i >= K && md5h(toks.slice(i - K, i).mkString(" ")) % M == 0
    }
    val out = Vector.newBuilder[Seq[String]]
    var start = 0
    (1 to toks.size).foreach { i =>
      if (cuts(i - 1) || i == toks.size) {
        out += toks.slice(start, i); start = i
      }
    }
    out.result().filter(_.nonEmpty)
  }

  private def bruteStats(docs: Seq[(Long, String)]) = {
    val ch = docs.map { case (id, t) =>
      id -> chunksOf(t.split(" ").toSeq)
    }
    val mult = ch.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
    ch.map { case (id, cs) =>
      val dup = cs.filter(mult(_) >= 2)
      (id, cs.size.toLong, dup.size.toLong, dup.map(_.size.toLong).sum)
    }
  }

  test("dupStats matches the in-memory replay on a seeded corpus") {
    val rnd = new scala.util.Random(11)
    val vocab = Seq("aa", "b", "cc", "d", "e")
    val docs = (1L to 30L).map { id =>
      id -> Seq.fill(20 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    }
    val got = CdcChunks.dupStats(docs.toDF("doc_id", "text"),
        "doc_id", "text", K, M)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === bruteStats(docs).toSet)
  }

  test("shift robustness: a one-token head insertion still dedups the tail") {
    val rnd = new scala.util.Random(5)
    val vocab = Seq("x", "yy", "z", "w")
    val body = Seq.fill(80)(vocab(rnd.nextInt(vocab.size)))
    val docs = Seq(1L -> body.mkString(" "),
      2L -> ("q " + body.mkString(" ")))
    val brute = bruteStats(docs)
    // the replay itself proves the property holds for this fixture:
    // both docs must share at least one duplicated chunk
    assert(brute.forall(_._3 >= 1),
      s"fixture lost CDC realignment: $brute")
    val got = CdcChunks.dupStats(docs.toDF("doc_id", "text"),
        "doc_id", "text", K, M)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === brute.toSet)
  }

  test("docs with no tokens report zeros") {
    val docs = Seq(1L -> "a b c d e f g h", 2L -> "   ")
    val got = CdcChunks.dupStats(docs.toDF("doc_id", "text"),
        "doc_id", "text", K, M)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(2L) === ((0L, 0L, 0L)))
  }
}
