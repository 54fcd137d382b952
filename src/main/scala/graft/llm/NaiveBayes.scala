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
  * column per class (inference = ONE token-grain equi-join, not C).
  * The smoothing denominators, priors and OOV defaults are 1-ROW
  * aggregates collected to the driver and inlined as literals (the
  * kMeans-centroid bounded-collect pattern) — no broadcast join
  * whose build side a plan audit can't bound. Vocabulary tables are
  * data-grain at corpus scale — the scoring join is a plain equi-join
  * the planner can SMJ or broadcast as stats dictate; nothing
  * data-grain is ever collected or crossed.
  *
  * Smoothing: add-one at the token level over the train vocabulary V
  * (`lp(t,c) = ln((cnt_tc + 1)/(N_c + V))`, OOV tokens get the
  * zero-count value), and add-one priors over the class count
  * (`ln((docs_c + 1)/(docs + C))`). Each log is rounded ONCE to
  * integer nano-units at model grain; the driver-side constants use
  * the same HALF_UP grid as engine `round()`
  * ([[LangModel.unseenLpNano]]'s discipline — `math.round` would sit
  * half a ULP off for negative logs).
  */
object NaiveBayes {

  private def nanoCol(x: Column): Column = round(x * lit(1e9)).cast("long")

  /** Driver-side nano rounding on the engine `round()` grid (HALF_UP,
    * away from zero — NOT `math.round`'s half-toward-+∞).
    */
  private def nanoHalfUp(x: Double): Long =
    BigDecimal(x * 1e9).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /** Sufficient statistics, collected (TWO bounded 1-row collects):
    * per-class token totals, train vocabulary size, per-class doc
    * counts, train doc count.
    */
  final case class Stats(nTok: Seq[Long], v: Long, nDoc: Seq[Long],
                         docs: Long) {
    def oovNano(i: Int): Long =
      nanoHalfUp(math.log(1.0 / (nTok(i).toDouble + v.toDouble)))
    def priorNano(i: Int, c: Int): Long =
      nanoHalfUp(math.log((nDoc(i).toDouble + 1.0) /
        (docs.toDouble + c.toDouble)))
  }

  /** Collect the sufficient statistics from the train streams —
    * `(classCol, token)` rows and the train documents. One 1-row
    * aggregate each.
    */
  def fitStats(trainToks: DataFrame, trainDocs: DataFrame,
               classCol: String, classes: Seq[String]): Stats = {
    val tokAggs = classes.zipWithIndex.map { case (c, i) =>
      sum(when(col(classCol) === c, 1L).otherwise(0L)).as(s"__n_$i")
    } :+ countDistinct(col("token")).as("__v")
    val t = trainToks.agg(tokAggs.head, tokAggs.tail: _*).head()
    val docAggs = classes.zipWithIndex.map { case (c, i) =>
      sum(when(col(classCol) === c, 1L).otherwise(0L)).as(s"__d_$i")
    } :+ count(lit(1)).as("__docs")
    val d = trainDocs.agg(docAggs.head, docAggs.tail: _*).head()
    def z(r: org.apache.spark.sql.Row, i: Int): Long =
      if (r.isNullAt(i)) 0L else r.getLong(i)
    Stats(classes.indices.map(z(t, _)), z(t, classes.size),
      classes.indices.map(z(d, _)), z(d, classes.size))
  }

  /** Wide per-token model `(token, lp_0..lp_{C-1})`: add-one smoothed
    * log-probabilities with the collected denominators inlined — the
    * engine computes one ln per (token, class) and rounds once.
    */
  def tokenModel(trainToks: DataFrame, classCol: String,
                 classes: Seq[String], stats: Stats): DataFrame = {
    val countCols = classes.zipWithIndex.map { case (c, i) =>
      sum(when(col(classCol) === c, 1L).otherwise(0L)).as(s"__c_$i")
    }
    trainToks.groupBy(col("token"))
      .agg(countCols.head, countCols.tail: _*)
      .select(col("token") +: classes.indices.map { i =>
        nanoCol(log((col(s"__c_$i").cast("double") + 1.0) /
          lit(stats.nTok(i).toDouble + stats.v.toDouble))).as(s"lp_$i")
      }: _*)
  }

  /** Predicted class per held-out document: scores every class with
    * exact BIGINT sums and takes the argmax, earlier `classes` entry
    * winning ties. Documents with no tokens are classified by priors
    * alone. Input streams carry `(idCol, token)` (held) and
    * `(classCol, token)` (train).
    * @return (idCol, score_0..score_{C-1}, `pred`)
    */
  def classify(heldDocs: DataFrame, heldToks: DataFrame, idCol: String,
               trainDocs: DataFrame, trainToks: DataFrame,
               classCol: String, classes: Seq[String]): DataFrame = {
    val stats = fitStats(trainToks, trainDocs, classCol, classes)
    val model = tokenModel(trainToks, classCol, classes, stats)

    val sumCols = classes.indices.map { i =>
      sum(coalesce(col(s"lp_$i"), lit(stats.oovNano(i)))).as(s"__s_$i")
    }
    val sums = heldToks.join(model, Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(sumCols.head, sumCols.tail: _*)

    val withScores = heldDocs.select(col(idCol))
      .join(sums, Seq(idCol), "left")
      .select(col(idCol) +: classes.indices.map { i =>
        (coalesce(col(s"__s_$i"), lit(0L)) +
          lit(stats.priorNano(i, classes.size))).as(s"score_$i")
      }: _*)
    // argmax with first-class tie preference — the cascade tries
    // classes in order, each winning when >= every later class
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
