package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.LangModel

/** Char-bigram LM: hand-checked probabilities on a two-doc corpus,
  * normalization folding, gibberish ranking below corpus-typical text,
  * out-of-model scoring, and partitioning invariance of the scores.
  */
class LangModelSpec extends AnyFunSuite with org.scalactic.Tolerance {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("hand-computed add-one bigram likelihoods on a tiny corpus") {
    // bigrams: doc1 [ab]; doc2 [ab, ba, ab] → cnt(ab)=3, cnt(ba)=1,
    // total=4, V=2 → lp(ab)=ln(4/6), lp(ba)=ln(2/6)
    val docs = Seq((1L, "ab"), (2L, "abab")).toDF("doc_id", "text")
    val model = LangModel.trainBigramModel(docs, "text")
    val lp = model.select("bigram", "lp_nano").as[(String, Long)]
      .collect().toMap
    assert(lp("ab") === math.round(math.log(4.0 / 6.0) * 1e9))
    assert(lp("ba") === math.round(math.log(2.0 / 6.0) * 1e9))
    val scores = LangModel.scoreDocs(docs, "doc_id", "text", model)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(scores(1L) ===
      math.round(math.log(4.0 / 6.0) * 1e9) / 1e9 +- 1e-6)
    val d2 = (2 * math.round(math.log(4.0 / 6.0) * 1e9) +
      math.round(math.log(2.0 / 6.0) * 1e9)) / 3.0 / 1e9
    assert(scores(2L) === d2 +- 1e-6)
  }

  test("normalization folds case and whitespace before bigramming") {
    val a = LangModel.charBigrams(lit("A   B"))
    val b = LangModel.charBigrams(lit("a b"))
    val Seq((ba, bb)) = Seq(1).toDF("x").select(a, b)
      .as[(Seq[String], Seq[String])].collect().toSeq
    assert(ba === bb && ba === Seq("a ", " b"))
    // sub-2-char text yields no bigrams
    assert(Seq(1).toDF("x").select(LangModel.charBigrams(lit("  x ")))
      .as[Seq[String]].head() === Seq.empty)
  }

  test("gibberish scores below corpus-typical text") {
    val docs = ((1L to 20L).map(i => (i, "the cat sat on the mat")) :+
      (99L, "zq xv kj qz wx jk")).toDF("doc_id", "text")
    val scores = LangModel.scoreDocs(docs, "doc_id", "text",
        LangModel.trainBigramModel(docs, "text"))
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(scores(99L) < scores(1L))
  }

  test("out-of-model bigrams: strict mode drops them, unseen default scores them") {
    val train = Seq((1L, "abab")).toDF("doc_id", "text")
    val model = LangModel.trainBigramModel(train, "text")
    val novel = Seq((7L, "xy")).toDF("doc_id", "text")
    assert(LangModel.scoreDocs(novel, "doc_id", "text", model).count() === 0)
    val unseen = LangModel.unseenLpNano(model)
    // "abab" alone: total=3, V=2 → unseen lp = ln(1/5)
    assert(unseen === math.round(math.log(1.0 / 5.0) * 1e9))
    val r = LangModel.scoreDocs(novel, "doc_id", "text", model, Some(unseen))
      .select("score").as[Double].head()
    assert(r === math.round(math.log(1.0 / 5.0) * 1e9) / 1e9 +- 1e-6)
  }

  test("scores are partitioning-invariant (integer-exact sums)") {
    val docs = (1L to 50L).map(i => (i, s"document number $i with words"))
      .toDF("doc_id", "text")
    val model = LangModel.trainBigramModel(docs, "text")
    val one = LangModel.scoreDocs(docs, "doc_id", "text", model)
      .orderBy("doc_id").collect().toSeq
    val many = LangModel.scoreDocs(docs.repartition(16), "doc_id", "text",
      model).orderBy("doc_id").collect().toSeq
    assert(one === many)
  }
}
