package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes over word tokens — the trainable corpus
  * classifier (source/domain/quality gates à la fastText linear
  * models), built so that training AND inference are exact integer
  * arithmetic: training is nothing but counting aggregates, and a
  * document's class score is `prior_nano(c) + Σ_tokens lp_nano(t, c)`
  * — a BIGINT sum, partitioning/order-invariant, oracle-certifiable
  * bit-for-bit. This is why NB (and not SGD-trained logistic
  * regression) is the right first classifier for a distributed exact
  * engine: gradient methods are sequential-by-iteration and float-
  * accumulation-ordered; NB's sufficient statistics are one shuffle.
  *
  * The class list is BOUNDED and passed as literals, so the model
  * lays out WIDE: one vocabulary-grain table with a `lp_<class>`
  * column per class (inference = ONE token-grain equi-join, not C),
  * plus a 1-row totals/priors/OOV frame broadcast everywhere.
  * Vocabulary tables are data-grain at corpus scale — the scoring
  * join is a plain equi-join the planner can SMJ or broadcast as
  * stats dictate; nothing data-grain is ever collected or crossed.
  *
  * Smoothing: add-one at the token level over the train vocabulary V
  * (`lp(t,c) = ln((cnt_tc + 1)/(N_c + V))`, OOV tokens get the
  * zero-count value), and add-one priors over the class count
  * (`ln((docs_c + 1)/(docs + C))`). Each log is rounded ONCE to
  * integer nano-units at model grain (the [[LangModel]] discipline).
  */
object NaiveBayes {

  private def nano(x: Column): Column = round(x * lit(1e9)).cast("long")

  /** Wide per-token model: `(token, lp_0..lp_{C-1})` for the given
    * ordered class labels, from a `(classCol, token)` training stream.
    * `totals` must be [[tokenTotals]] of the same stream.
    */
  def tokenModel(trainToks: DataFrame, classCol: String,
                 classes: Seq[String], totals: DataFrame): DataFrame = {
    val counts = trainToks.groupBy(col("token"))
      .agg(classes.zipWithIndex.map { case (c, i) =>
        sum(when(col(classCol) === c, 1L).otherwise(0L)).as(s"__c_$i")
      }: _*)
    counts.join(broadcast(totals))
      .select(col("token") +: classes.indices.map { i =>
        nano(log((col(s"__c_$i").cast("double") + 1.0) /
          (col(s"__n_$i").cast("double") + col("__v").cast("double"))))
          .as(s"lp_$i")
      }: _*)
  }

  /** 1-row token totals: per-class token counts `__n_i` and the train
    * vocabulary size `__v` — the smoothing denominators.
    */
  def tokenTotals(trainToks: DataFrame, classCol: String,
                  classes: Seq[String]): DataFrame =
    trainToks.agg(
      classes.zipWithIndex.map { case (c, i) =>
        sum(when(col(classCol) === c, 1L).otherwise(0L)).as(s"__n_$i")
      } :+ countDistinct(col("token")).as("__v"): _*
    ) match { case df =>
      // aggregate needs head :: tail — rebuild with the first as anchor
      df
    }

  /** 1-row class priors and OOV defaults: `prior_i` =
    * nano(ln((docs_i + 1)/(docs + C))), `oov_i` = the zero-count token
    * lp under class i. Joined (broadcast) onto doc scores.
    */
  def priorsAndOov(trainDocs: DataFrame, classCol: String,
                   classes: Seq[String], totals: DataFrame): DataFrame = {
    val d = trainDocs.agg(
      count(lit(1)).as("__docs"),
      classes.zipWithIndex.map { case (c, i) =>
        sum(when(col(classCol) === c, 1L).otherwise(0L)).as(s"__d_$i")
      }: _*)
    d.join(broadcast(totals))
      .select(classes.indices.flatMap { i =>
        Seq(
          nano(log((col(s"__d_$i").cast("double") + 1.0) /
            (col("__docs").cast("double") + lit(classes.size.toDouble))))
            .as(s"prior_$i"),
          nano(log(lit(1.0) /
            (col(s"__n_$i").cast("double") + col("__v").cast("double"))))
            .as(s"oov_$i"))
      }: _*)
  }

  /** Predicted class per held-out document: scores every class with
    * exact BIGINT sums and takes the argmax, earlier `classes` entry
    * winning ties. Documents with no tokens are classified by priors
    * alone. Input streams carry `(idCol, token)` (held) and
    * `(classCol, token)` (train).
    * @return (idCol, `pred`) — plus one `score_<i>` BIGINT per class
    */
  def classify(heldDocs: DataFrame, heldToks: DataFrame, idCol: String,
               trainDocs: DataFrame, trainToks: DataFrame,
               classCol: String, classes: Seq[String]): DataFrame = {
    val totals = tokenTotals(trainToks, classCol, classes)
      .localCheckpoint(true) // tiny, feeds model + priors + scoring
    val model = tokenModel(trainToks, classCol, classes, totals)
    val po = priorsAndOov(trainDocs, classCol, classes, totals)

    val joined = heldToks.join(model, Seq("token"), "left")
      .join(broadcast(po))
    val sums = joined.groupBy(col(idCol))
      .agg(classes.indices.map { i =>
        sum(coalesce(col(s"lp_$i"), col(s"oov_$i"))).as(s"__s_$i")
      }.head, classes.indices.map { i =>
        sum(coalesce(col(s"lp_$i"), col(s"oov_$i"))).as(s"__s_$i")
      }.tail: _*)
      .dropDuplicates(idCol) // no-op: groupBy grain; keeps intent clear

    val withScores = heldDocs.select(col(idCol))
      .join(sums, Seq(idCol), "left")
      .join(broadcast(po))
      .select(col(idCol) +: classes.indices.map { i =>
        (coalesce(col(s"__s_$i"), lit(0L)) + col(s"prior_$i"))
          .as(s"score_$i")
      }: _*)
    // argmax with first-class tie preference: class i wins when its
    // score is >= every later class's and > none of the earlier need
    // checking (the cascade tries classes in order)
    val pred = classes.indices.init.foldRight(
      lit(classes.last): Column) { (i, elseCol) =>
      val geAllLater = classes.indices.drop(i + 1)
        .map(j => col(s"score_$i") >= col(s"score_$j"))
        .reduce(_ && _)
      when(geAllLater, lit(classes(i))).otherwise(elseCol)
    }
    withScores.withColumn("pred", pred)
  }

  /** Train-on-80/score-on-20 confusion matrix at (actual, pred) grain:
    * the classifier eval product. Split: `pmod(id, 5) = 0` held out —
    * the repo's standing split discipline.
    */
  def confusion(docs: DataFrame, idCol: String, textCol: String,
                classCol: String, classes: Seq[String]): DataFrame = {
    val toks = docs.select(col(idCol), col(classCol),
      explode(TextStats.tokens(col(textCol))).as("token"))
    val isHeld = pmod(col(idCol), lit(5L)) === 0
    val preds = classify(
      docs.where(isHeld), toks.where(isHeld), idCol,
      docs.where(!isHeld), toks.where(!isHeld), classCol, classes)
    docs.where(isHeld).select(col(idCol), col(classCol).as("actual"))
      .join(preds.select(col(idCol), col("pred")), Seq(idCol))
      .groupBy(col("actual"), col("pred"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("actual"), col("pred"))
  }
}
