package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Bpe

/** BPE merge-table training: the distributed iterated-replace trainer
  * must agree bit-for-bit with an independent in-memory greedy BPE
  * reference, and re-tokenizing with the learned table must round-trip
  * to the exact training state.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Independent reference: plain in-memory greedy BPE (single
    * left-to-right scan per merge application, argmax pair by
    * (count desc, left asc, right asc)) — the semantics the
    * iterated-replace implementation must reproduce.
    */
  private def refBpe(words: Map[String, Long], numMerges: Int)
    : (Seq[(String, String, Long)], Map[String, Long]) = {
    // Sennrich '16 initial alphabet: the final character carries the
    // end-of-word marker, same as Bpe.initialSymbols
    var state: Seq[(Vector[String], Long)] =
      words.toSeq.map { case (w, c) =>
        val cs = w.map(_.toString).toVector
        (cs.init :+ (cs.last + Bpe.EndOfWord), c)
      }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var stop = false
    while (merges.size < numMerges && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      state.foreach { case (syms, c) =>
        syms.iterator.sliding(2).withPartial(false).foreach { p =>
          counts((p.head, p(1))) = counts.getOrElse((p.head, p(1)), 0L) + c
        }
      }
      if (counts.isEmpty) stop = true
      else {
        val ((l, r), pc) = counts.toSeq
          .sortBy { case ((a, b), n) => (-n, a, b) }.head
        merges += ((l, r, pc))
        state = state.map { case (syms, c) =>
          val buf = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              buf += (l + r); i += 2
            } else { buf += syms(i); i += 1 }
          }
          (buf.result(), c)
        }
      }
    }
    (merges.toSeq,
      state.groupMapReduce(_._1.mkString(" "))(_._2)(_ + _))
  }

  private def learn(words: Map[String, Long], n: Int) =
    Bpe.learnMerges(words.toSeq.toDF("word", "cnt"), "word", "cnt",
        numMerges = n)
      .collect().map(r =>
        (r.getString(1), r.getString(2), r.getLong(3))).toSeq

  test("classic corpus: merges match the in-memory greedy reference") {
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L)
    val (expected, _) = refBpe(words, 8)
    assert(learn(words, 8) === expected)
  }

  test("boundary-sharing runs merge greedily left-to-right, same as the reference") {
    // 'aaaa' under merge (a,a): greedy gives (aa)(aa), never a(aa)a —
    // the case the iterated replace exists to get right
    val words = Map("aaaa" -> 4L, "aaa" -> 3L, "baab" -> 2L)
    val (expected, expectedState) = refBpe(words, 5)
    assert(learn(words, 5) === expected)
    val (got, stateDf) = Bpe.learnMergesWithState(
      words.toSeq.toDF("word", "cnt"), "word", "cnt", numMerges = 5)
    assert(got.map(m => (m.lft, m.rgt, m.pairCount)) === expected)
    val gotState = stateDf.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotState === expectedState)
  }

  test("re-tokenization round-trip: applyMerges reproduces the training state and loses no characters") {
    val words = Map("low" -> 5L, "lowest" -> 1L, "newest" -> 6L,
      "wider" -> 3L, "new" -> 2L)
    val (merges, state) = Bpe.learnMergesWithState(
      words.toSeq.toDF("word", "cnt"), "word", "cnt", numMerges = 10)
    val (_, expectedState) = refBpe(words, 10)
    assert(state.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      === expectedState)
    // no character loss: stripping spaces AND the terminal marker from
    // the segmentation gives back the original word, for every word
    val retok = Bpe.applyMerges(words.toSeq.toDF("word", "cnt"), "word",
      merges.map(m => (m.lft, m.rgt)))
    assert(retok.where(
      regexp_replace(replace(col("syms"), lit(Bpe.EndOfWord), lit("")),
        " ", "") =!= col("word")).count() === 0L)
    // the marker appears exactly once per word, as a token SUFFIX — a
    // merge can therefore never span what detokenization treats as a
    // word boundary
    retok.collect().foreach { r =>
      val toks = r.getAs[String]("syms").split(" ")
      assert(toks.count(_.contains(Bpe.EndOfWord)) === 1, r)
      assert(toks.last.endsWith(Bpe.EndOfWord), r)
      toks.foreach(t =>
        assert(t.indexOf(Bpe.EndOfWord) ===
          (if (t.contains(Bpe.EndOfWord)) t.length - 4 else -1), r))
    }
  }

  test("tokenizeDocWords maps occurrences through the per-form table") {
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L)
    val merges = Bpe.learnMergesCached("bpespec:docwords8",
      words.toSeq.toDF("word", "cnt"), "word", "cnt", numMerges = 8)
    val occurrences = Seq((1L, 0, "low"), (1L, 1, "newest"),
      (2L, 0, "lower"), (2L, 1, "low"), (2L, 2, "widest"))
      .toDF("doc_id", "pos", "word")
    val got = Bpe.tokenizeDocWords(occurrences, "word",
        merges.map(m => (m.lft, m.rgt)))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("pos"),
        r.getAs[String]("word"), r.getAs[String]("syms"))).toSet
    val perForm = Bpe.applyMerges(words.keys.toSeq.toDF("word"), "word",
        merges.map(m => (m.lft, m.rgt)))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Set((1L, 0, "low", perForm("low")),
      (1L, 1, "newest", perForm("newest")),
      (2L, 0, "lower", perForm("lower")), (2L, 1, "low", perForm("low")),
      (2L, 2, "widest", perForm("widest"))))
  }

  test("tokenizeStats agrees with the reference final state") {
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L)
    val (_, state) = refBpe(words, 6)
    val merges = Bpe.learnMergesCached("bpespec:classic6",
      words.toSeq.toDF("word", "cnt"), "word", "cnt", numMerges = 6)
    val got = Bpe.tokenizeStats(words.toSeq.toDF("word", "cnt"),
      "word", "cnt", merges).head()
    val expTokens = state.map { case (syms, c) =>
      syms.split(" ").length * c }.sum
    val expVocab = state.keys.flatMap(_.split(" ")).toSet.size
    assert(got.getLong(0) === words.size.toLong)
    assert(got.getLong(1) === expTokens)
    assert(got.getLong(2) === expVocab.toLong)
  }

  test("early exhaustion: a single-symbol vocab yields zero merges") {
    assert(learn(Map("a" -> 10L, "b" -> 3L), 4) === Seq.empty)
  }

  test("tie break is (count desc, left asc, right asc)") {
    // 'ab' and 'ba' both appear 3 times → (a,b) must win
    val words = Map("ab" -> 3L, "ba" -> 3L)
    assert(learn(words, 1).head._1 === "a")
  }

  private def learnBatched(words: Map[String, Long], n: Int, k: Int) =
    Bpe.learnMergesBatched(words.toSeq.toDF("word", "cnt"), "word", "cnt",
        numMerges = n, batchK = k)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

  private def learnSeq(words: Map[String, Long], n: Int) =
    Bpe.learnMerges(words.toSeq.toDF("word", "cnt"), "word", "cnt",
        numMerges = n)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

  test("batched trainer equals sequential greedy on the classic corpus, all batch widths") {
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L)
    val expected = learnSeq(words, 12)
    for (k <- Seq(1, 2, 4, 8, 64))
      assert(learnBatched(words, 12, k) === expected, s"batchK=$k diverged")
  }

  test("batched trainer equals sequential on a pseudo-random corpus") {
    // deterministic LCG corpus: ~200 words over a small alphabet, so
    // rounds hit dense pair interactions, exhaustion tails, and ties
    var s = 12345L
    def next(m: Int) = { s = (s * 6364136223846793005L + 1442695040888963407L); (((s >>> 33) % m) + m) % m }
    val alpha = "abcde"
    val words = (0 until 200).map { _ =>
      val len = 1 + next(8).toInt
      (0 until len).map(_ => alpha(next(5).toInt)).mkString
    }.groupBy(identity).map { case (w, g) => w -> (g.size * (1 + next(7))) }
    val expected = learnSeq(words, 30)
    for (k <- Seq(4, 16))
      assert(learnBatched(words, 30, k) === expected, s"batchK=$k diverged")
  }

  test("batched interaction case: top-2 pairs share a symbol, batch must take one and re-rank") {
    // (a,b) 10 and (b,c) 8 share 'b': a naive top-2 batch would apply
    // both against stale counts ((b,c) drops to 0 once (a,b) merges
    // first in 'x a b c'); the disjointness rule takes only (a,b), and
    // the next round re-ranks — matching sequential exactly
    val words = Map("abc" -> 8L, "ab" -> 2L, "dd" -> 3L)
    val expected = learnSeq(words, 6)
    for (k <- Seq(2, 8))
      assert(learnBatched(words, 6, k) === expected, s"batchK=$k diverged")
  }

  test("batched self-pair cut: overlapping-run residue can't poison the batch") {
    // (a,a) dominates with overlapping runs ('aaaa' → '(aa)(aa)',
    // 'aaa' → '(aa)a' residue): the minted (aa, a) pair derives its
    // count from the selected pair itself, so the batch must stop at
    // the self-pair instead of trusting stale counts for later picks
    val words = Map("aaaa" -> 6L, "aaa" -> 5L, "bc" -> 4L, "de" -> 3L)
    val expected = learnSeq(words, 8)
    for (k <- Seq(2, 4, 8))
      assert(learnBatched(words, 8, k) === expected, s"batchK=$k diverged")
  }

  test("batched 2·M barrier: a minted pair that ties the next pick forces truncation, not divergence") {
    // after (a,b) merges, the minted (x, ab</w>) pair ties (c,d) at 6;
    // sequential tie-breaks between them by symbol order — the barrier
    // (affected max = 6, so 2M ≥ any tentative tail) truncates the
    // batch to (a,b) alone and lets the re-count decide, keeping
    // bit-equality
    val words = Map("xab" -> 6L, "ab" -> 4L, "cd" -> 6L, "xa" -> 1L)
    val expected = learnSeq(words, 6)
    for (k <- Seq(2, 8))
      assert(learnBatched(words, 6, k) === expected, s"batchK=$k diverged")
  }

  private def learnLocal(words: Map[String, Long], n: Int,
                         passes: Int = 8) =
    Bpe.learnMergesLocal(words.toSeq.toDF("word", "cnt"), "word", "cnt",
        numMerges = n, passes = passes)
      .map(m => (m.rank, m.lft, m.rgt, m.pairCount))

  private def learnSeqP(words: Map[String, Long], n: Int, passes: Int) =
    Bpe.learnMerges(words.toSeq.toDF("word", "cnt"), "word", "cnt",
        numMerges = n, passes = passes)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

  test("local trainer equals distributed sequential on the classic corpus") {
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L)
    assert(learnLocal(words, 12) === learnSeq(words, 12))
  }

  test("local trainer equals distributed on a pseudo-random corpus, ties included") {
    var s = 98765L
    def next(m: Int) = { s = (s * 6364136223846793005L + 1442695040888963407L); (((s >>> 33) % m) + m) % m }
    val alpha = "abcde"
    val words = (0 until 200).map { _ =>
      val len = 1 + next(8).toInt
      (0 until len).map(_ => alpha(next(5).toInt)).mkString
    }.groupBy(identity).map { case (w, g) => w -> (g.size * (1 + next(7))) }
    assert(learnLocal(words, 30) === learnSeq(words, 30))
  }

  test("local trainer mirrors the passes-bounded replace on over-length words") {
    // 22-symbol boundary-sharing words with passes=1 and 2: a single
    // replace pass CANNOT merge the occurrence right after a merged one
    // (its leading space was consumed), so the round's state — and with
    // it every later pair count — depends on that subtlety. The local
    // trainer must under-merge IDENTICALLY, not 'more correctly'.
    val words = Map("ababababababababababab" -> 7L,
      "aaaaaaaaaaaaaaaaaaaaaa" -> 5L, "abab" -> 3L, "cd" -> 2L)
    for (p <- Seq(1, 2, 8))
      assert(learnLocal(words, 10, passes = p) ===
        learnSeqP(words, 10, passes = p), s"passes=$p diverged")
  }

  test("local trainer exhausts like distributed on a single-symbol vocab") {
    assert(learnLocal(Map("a" -> 10L, "b" -> 3L), 4) === Seq.empty)
  }

  test("local trainer maxForms bound fails loud, never truncates") {
    val words = Map("ab" -> 2L, "cd" -> 1L, "ef" -> 1L)
    val e = intercept[IllegalArgumentException] {
      Bpe.learnMergesLocal(words.toSeq.toDF("word", "cnt"), "word", "cnt",
        numMerges = 2, maxForms = 2)
    }
    assert(e.getMessage.contains("maxForms"))
  }

  test("export/import round-trip: re-imported merges tokenize identically") {
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L)
    val merges = Bpe.learnMergesCached("bpespec:export8",
      words.toSeq.toDF("word", "cnt"), "word", "cnt", numMerges = 8)
    val path = java.nio.file.Files.createTempFile("graft_bpe_", ".txt")
    try {
      Bpe.exportMerges(merges, path.toString)
      val lines = java.nio.file.Files.readAllLines(path)
      assert(lines.get(0).startsWith("#graft bpe v1"))
      assert(lines.size === merges.size + 1)
      val imported = Bpe.importMerges(path.toString)
      assert(imported === merges.map(m => (m.lft, m.rgt)))
      val before = Bpe.applyMerges(words.keys.toSeq.toDF("word"), "word",
        merges.map(m => (m.lft, m.rgt)))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val after = Bpe.applyMerges(words.keys.toSeq.toDF("word"), "word",
        imported)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(after === before)
    } finally java.nio.file.Files.deleteIfExists(path)
  }
}
