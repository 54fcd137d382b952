package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.UnigramLm

/** Unigram-LM Viterbi tokenization: vocabulary contract (min-count
  * with the single-char floor), hand-computed maximum-likelihood
  * segmentations, the fewest-pieces tie rule, and doc-stat edges.
  */
class UnigramLmSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("vocab: min-count prunes multi-char pieces, single chars always kept") {
    val counts = Seq(("a", 1L), ("b", 2L), ("ab", 2L), ("abc", 5L))
      .toDF("piece", "cnt")
    val v = UnigramLm.vocab(counts).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v.keySet === Set("a", "b", "abc")) // "ab" under MinCount=3
    // normalized over the KEPT set: total = 1 + 2 + 5 = 8
    assert(v("abc") === math.round(math.log(5.0 / 8.0) * 1e9))
    assert(v("a") === math.round(math.log(1.0 / 8.0) * 1e9))
  }

  test("segmentForms: Viterbi picks the likelihood-optimal split") {
    val forms = Seq(("ab", 3L)).toDF("word", "n_occ")
    // "ab" as one piece (-1) beats "a"+"b" (-6)
    val vocab = Seq(("ab", -1000000000L), ("a", -3000000000L),
      ("b", -3000000000L)).toDF("piece", "lp_nano")
    val got = UnigramLm.segmentForms(forms, vocab).head()
    assert(got.getAs[Long]("n_pieces") === 1L)
    assert(got.getAs[Long]("score_nano") === -1000000000L)

    // flip the odds: chars (-1 each) beat the bigram (-5)
    val vocab2 = Seq(("ab", -5000000000L), ("a", -1000000000L),
      ("b", -1000000000L)).toDF("piece", "lp_nano")
    val got2 = UnigramLm.segmentForms(forms, vocab2).head()
    assert(got2.getAs[Long]("n_pieces") === 2L)
    assert(got2.getAs[Long]("score_nano") === -2000000000L)
  }

  test("segmentForms: equal likelihood ties go to fewest pieces") {
    val forms = Seq(("ab", 1L)).toDF("word", "n_occ")
    val vocab = Seq(("ab", -4000000000L), ("a", -2000000000L),
      ("b", -2000000000L)).toDF("piece", "lp_nano")
    val got = UnigramLm.segmentForms(forms, vocab).head()
    assert(got.getAs[Long]("score_nano") === -4000000000L)
    assert(got.getAs[Long]("n_pieces") === 1L)
  }

  test("segmentForms: 4-char max piece forces a split on longer words") {
    val forms = Seq(("abcde", 1L)).toDF("word", "n_occ")
    val vocab = Seq(("abcd", -1000000000L), ("e", -2000000000L),
      ("a", -9000000000L), ("b", -9000000000L), ("c", -9000000000L),
      ("d", -9000000000L), ("bcde", -1500000000L))
      .toDF("piece", "lp_nano")
    // best: a(-9) + bcde(-1.5) = -10.5 vs abcd(-1) + e(-2) = -3 -> latter
    val got = UnigramLm.segmentForms(forms, vocab).head()
    assert(got.getAs[Long]("n_pieces") === 2L)
    assert(got.getAs[Long]("score_nano") === -3000000000L)
  }

  test("exportVocab round-trips bit-for-bit and reproduces segmentation") {
    val docs = Seq((1L, "hello world hello held hell"), (2L, "low lower new newer"))
      .toDF("doc_id", "text")
    val occ = UnigramLm.wordOccurrences(docs, "doc_id", "text")
    val forms = UnigramLm.wordForms(occ)
    val vocab = UnigramLm.vocab(UnigramLm.pieceCounts(forms))
    val dir = java.nio.file.Files.createTempDirectory("uni_vocab").toString
    UnigramLm.exportVocab(vocab, s"$dir/v")
    val back = UnigramLm.importVocab(spark, s"$dir/v")
    assert(back.orderBy("piece").collect().map(_.toSeq).toSeq ===
      vocab.orderBy("piece").collect().map(_.toSeq).toSeq)
    val a = UnigramLm.segmentForms(forms, vocab).orderBy("word")
      .collect().map(_.toSeq)
    val b = UnigramLm.segmentForms(forms, back).orderBy("word")
      .collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("docStats: zero row for wordless docs, over-length words excluded, partition-invariant") {
    val long = "x" * 40 // over MaxWordLen -> excluded everywhere
    val docs = Seq((1L, "aa aa bb"), (2L, ""), (3L, long))
      .toDF("doc_id", "text")
    val a = UnigramLm.docStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq)
    val b = UnigramLm.docStats(docs.repartition(5), "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
    assert(a(1).drop(1) === Seq(0L, 0L, 0L)) // empty doc
    assert(a(2).drop(1) === Seq(0L, 0L, 0L)) // only the over-length word
    assert(a(0)(1) === 3L)                   // three in-contract words
  }
}
