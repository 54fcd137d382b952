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

  test("viterbiPieces: the backpointer walk emits exactly the optimal path") {
    val forms = Seq(("abcde", 2L), ("ab", 1L)).toDF("word", "n_occ")
    val vocab = Seq(("abcd", -1000000000L), ("e", -2000000000L),
      ("a", -9000000000L), ("b", -9000000000L), ("c", -9000000000L),
      ("d", -9000000000L), ("bcde", -1500000000L), ("ab", -1100000000L))
      .toDF("piece", "lp_nano")
    val got = UnigramLm.viterbiPieces(forms, vocab)
      .collect().map(r => (r.getString(0), r.getString(2)))
    // abcde -> abcd + e (the segmentForms-certified optimum); ab -> ab
    assert(got.toSet === Set(("abcde", "abcd"), ("abcde", "e"), ("ab", "ab")))
    assert(got.length === 3) // multiplicity: no duplicates here
  }

  test("trainVocab: E-step usage prunes unused pieces, M-step renormalizes") {
    // 'ab' dominates: every Viterbi path uses it, so 'a'+'b' go unused
    // as multi... they're single chars (always kept); piece 'aba' is in
    // the seed (cnt >= 3) but never on an optimal path -> pruned.
    val docs = Seq((1L, "abab abab abab"), (2L, "ab ab abab"))
      .toDF("doc_id", "text")
    val forms = UnigramLm.wordForms(
      UnigramLm.wordOccurrences(docs, "doc_id", "text"))
    val trained = UnigramLm.trainVocab(forms, rounds = 2)
    val rows = trained.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // single chars survive even if unused (usage floored at 1)
    assert(rows.contains("a") && rows.contains("b"))
    // the workhorse pieces survive with their real usage counts:
    // form "abab" (4 occ) Viterbi-segments as the single piece "abab",
    // form "ab" (2 occ) as "ab"
    assert(rows.contains("abab") && rows("abab")._1 === 4L)
    assert(rows.contains("ab") && rows("ab")._1 === 2L)
    // seed pieces that no optimal path used are gone
    assert(!rows.contains("aba") && !rows.contains("bab"))
    // log-probs are normalized over the kept set: sum of exp(lp) ~ 1
    val mass = rows.values.map(v => math.exp(v._2 / 1e9)).sum
    assert(math.abs(mass - 1.0) < 1e-6)
    // determinism: retraining yields the identical frame
    val again = UnigramLm.trainVocab(forms, rounds = 2).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(again === rows)
  }

  test("trainVocab round-trips through exportVocab and re-segments identically") {
    val docs = Seq((1L, "hello world hello held hell hello"),
      (2L, "low lower new newer lowest")).toDF("doc_id", "text")
    val forms = UnigramLm.wordForms(
      UnigramLm.wordOccurrences(docs, "doc_id", "text"))
    val trained = UnigramLm.trainVocab(forms, rounds = 2)
      .select(col("piece"), col("lp_nano"))
    val dir = java.nio.file.Files.createTempDirectory("uni_train").toString
    UnigramLm.exportVocab(trained, s"$dir/v")
    val back = UnigramLm.importVocab(spark, s"$dir/v")
    assert(back.orderBy("piece").collect().map(_.toSeq).toSeq ===
      trained.orderBy("piece").collect().map(_.toSeq).toSeq)
    val a = UnigramLm.segmentForms(forms, trained).orderBy("word")
      .collect().map(_.toSeq)
    val b = UnigramLm.segmentForms(forms, back).orderBy("word")
      .collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("trainVocabToSize: prunes to the target, derives the round count, partition-invariant") {
    // enough distinct words that the seed multi vocab far exceeds the
    // target, forcing the shrink loop to actually iterate
    val docs = (0 until 40).map { i =>
      (i.toLong, s"alpha$i beta$i gamma delta alpha$i")
    }.toDF("doc_id", "text")
    val forms = UnigramLm.wordForms(
      UnigramLm.wordOccurrences(docs, "doc_id", "text"))
    val (v, rounds) = UnigramLm.trainVocabToSize(forms, targetMulti = 8)
    val nMulti = v.where(length(col("piece")) > 1).count()
    assert(nMulti <= 8L)
    assert(rounds >= 1)
    // singles always survive: every observed char stays segmentable
    val singles = v.where(length(col("piece")) === 1).count()
    assert(singles > 0L)
    // derived count and vocabulary are partitioning-invariant
    val (v2, rounds2) = UnigramLm.trainVocabToSize(
      forms.repartition(7), targetMulti = 8)
    assert(rounds2 === rounds)
    assert(v2.orderBy("piece").collect().map(_.toSeq).toSeq ===
      v.orderBy("piece").collect().map(_.toSeq).toSeq)
    // already-satisfied target: zero rounds, the seed comes back
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val tf = UnigramLm.wordForms(
      UnigramLm.wordOccurrences(tiny, "doc_id", "text"))
    val (_, r0) = UnigramLm.trainVocabToSize(tf, targetMulti = 100)
    assert(r0 === 0)
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
