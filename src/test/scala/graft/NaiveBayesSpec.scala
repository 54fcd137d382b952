package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{LangModel, NaiveBayes}

/** Multinomial NB: hand-computed smoothed model values, OOV and
  * empty-doc behavior, the argmax tie rule, and learning on a corpus
  * where the classes are actually separable. Plus the CCNet tertile
  * machinery (LangModel.tertileByGrid): cutoff selection on the grid
  * and the tie-takes-better-bucket contract.
  */
class NaiveBayesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def nano(x: Double): Long = math.round(math.log(x) * 1e9)

  test("fitStats/tokenModel: add-one smoothing over train vocabulary") {
    val toks = Seq(("a", "cat"), ("a", "cat"), ("a", "dog"), ("b", "dog"))
      .toDF("cls", "token")
    val docs = Seq("a", "a", "b").toDF("cls")
    val stats = NaiveBayes.fitStats(toks, docs, "cls", Seq("a", "b"))
    assert(stats === NaiveBayes.Stats(Seq(3L, 1L), 2L, Seq(2L, 1L), 3L))
    val m = NaiveBayes.tokenModel(toks, "cls", Seq("a", "b"), stats)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // class a: N=3, V=2 -> cat (2+1)/5, dog (1+1)/5; class b: N=1 -> cat 1/3, dog 2/3
    assert(m("cat") === ((nano(3.0 / 5.0), nano(1.0 / 3.0))))
    assert(m("dog") === ((nano(2.0 / 5.0), nano(2.0 / 3.0))))
  }

  test("classify: separable classes are learned; OOV and empty docs fall to priors") {
    // train: class 'x' docs say xx-words, class 'y' docs say yy-words
    val train = (1L to 8L).map(i =>
      (i, if (i % 2 == 0) "x" else "y",
        if (i % 2 == 0) "alpha alpha beta" else "gamma gamma delta"))
      .toDF("doc_id", "lang", "text")
    val held = Seq(
      (100L, "x", "alpha beta"),   // clearly x
      (101L, "y", "gamma delta"),  // clearly y
      (102L, "x", "zzz qqq"),      // all OOV -> priors (tie -> first class)
      (103L, "y", "")              // empty -> priors
    ).toDF("doc_id", "lang", "text")
    val toks = (df: org.apache.spark.sql.DataFrame) => df.select(col("doc_id"),
      col("lang"), explode(graft.llm.TextStats.tokens(col("text"))).as("token"))
    val preds = NaiveBayes.classify(held, toks(held), "doc_id",
        train, toks(train), "lang", Seq("x", "y"))
      .collect().map(r => r.getLong(0) -> r.getString(r.fieldIndex("pred"))).toMap
    assert(preds(100L) === "x")
    assert(preds(101L) === "y")
    // 4 train docs each, equal priors; OOV lp identical per class
    // (N_x = N_y = 12, same V) -> exact tie -> first class wins
    assert(preds(102L) === "x")
    assert(preds(103L) === "x")
  }

  test("confusion: pmod-5 split, (actual, pred) grain counts") {
    val docs = (0L until 20L).map(i =>
      (i, if (i % 2 == 0) "x" else "y",
        if (i % 2 == 0) "alpha alpha beta" else "gamma gamma delta"))
      .toDF("doc_id", "lang", "text")
    val got = NaiveBayes.confusion(docs, "doc_id", "text", "lang",
        Seq("x", "y"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // held out: ids 0,5,10,15 -> x,y,x,y; separable -> diagonal
    assert(got.toSeq.sorted === Seq(("x", "x", 2L), ("y", "y", 2L)))
  }

  test("tertileByGrid: value cutoffs at ceil(n/3), ties take the better bucket") {
    // group g: grid values 9,8,7,6,5,4,3,2,1 (n=9) -> cuts at ranks 3,6:
    // cut1=7, cut2=4 -> buckets {9,8,7}=1 {6,5,4}=2 {3,2,1}=3
    val scored = (1L to 9L).map(v => ("g", v)).toDF("lang", "m")
    val got = LangModel.tertileByGrid(scored, "lang", "m")
      .collect().map(r => r.getLong(1) -> r.getInt(r.fieldIndex("bucket"))).toMap
    assert(got === Map(9L -> 1, 8L -> 1, 7L -> 1, 6L -> 2, 5L -> 2, 4L -> 2,
      3L -> 3, 2L -> 3, 1L -> 3))
    // ties: values 5,5,5,1 (n=4) -> r1=2, r2=3; cum at 5 is 3 >= both ->
    // cut1=cut2=5 -> all three 5s take bucket 1, the 1 takes bucket 3
    val tied = Seq(("g", 5L), ("g", 5L), ("g", 5L), ("g", 1L))
      .toDF("lang", "m")
    val got2 = LangModel.tertileByGrid(tied, "lang", "m")
      .groupBy("m", "bucket").count()
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got2 === Set((5L, 1, 3L), (1L, 3, 1L)))
  }
}
