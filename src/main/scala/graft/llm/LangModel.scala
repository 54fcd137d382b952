package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained character-bigram language model for quality scoring —
  * the statistical step past [[TextStats]]' heuristics (length, stopword
  * and punctuation ratios): train bigram frequencies on the corpus
  * itself, score each document by mean log-likelihood, and gibberish /
  * encoding-mangled / wrong-alphabet documents fall to the bottom
  * without any labeled data (the CCNet recipe, reduced to char bigrams).
  *
  * Scale shape: training is one explode + one bigram-grain aggregate;
  * the trained model is at most |alphabet|² rows, so scoring BROADCASTS
  * it onto the exploded bigram stream — map-only per document, then one
  * doc-grain aggregate. Nothing data-grain ever self-joins.
  *
  * Cross-engine exactness (the [[graft.ops.Trend]] discipline): each
  * bigram's log-probability is rounded ONCE to integer nano-units in
  * the model table (~|alphabet|² ln calls total); per-document sums are
  * then BIGINT-exact and partitioning/order-invariant, with one double
  * division at the end. A running double sum over the bigram stream
  * would drift by accumulation order; this never does.
  */
object LangModel {

  /** Case-folded, whitespace-collapsed text — the same canonical form
    * [[TextStats.fingerprint]] hashes.
    */
  def normalized(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Character bigrams of the normalized text (repeats kept — every
    * occurrence scores); empty for texts shorter than 2 chars.
    */
  def charBigrams(text: Column): Column = {
    val s = normalized(text)
    when(length(s) >= 2,
      transform(sequence(lit(1), length(s) - 1), i => s.substr(i, lit(2))))
      .otherwise(array().cast("array<string>"))
  }

  /** Train: `(bigram, cnt, lp_nano)` where `lp_nano` is the add-one
    * smoothed log-probability `ln((cnt+1)/(total+V))` in nano-units
    * (BIGINT). Smoothing keeps unseen bigrams finite when scoring text
    * the model was not trained on; [[unseenLpNano]] is that default.
    */
  def trainBigramModel(df: DataFrame, textCol: String): DataFrame = {
    val counts = df
      .select(explode(charBigrams(col(textCol))).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum(col("cnt")).as("__total"),
      count(lit(1)).as("__v"))
    counts.join(broadcast(tot))
      .select(col("bigram"), col("cnt"),
        round(log((col("cnt").cast("double") + 1.0) /
          (col("__total").cast("double") + col("__v").cast("double"))) *
          lit(1e9)).cast("long").as("lp_nano"))
  }

  /** The smoothed log-probability (nano-units) a zero-count bigram gets
    * under `model` — for scoring documents outside the training corpus.
    * Bounded driver collect: one row.
    */
  def unseenLpNano(model: DataFrame): Long = {
    val r = model.agg(sum(col("cnt")).cast("double").as("t"),
      count(lit(1)).cast("double").as("v")).head()
    math.round(math.log(1.0 / (r.getDouble(0) + r.getDouble(1))) * 1e9)
  }

  /** Score: `(id, n_bigrams, score)` with `score` = mean bigram
    * log-likelihood (6dp). `unseen = None` scores strictly (inner join —
    * right when scoring the training corpus itself); `Some(lpNano)`
    * left-joins with that default for out-of-model bigrams.
    */
  def scoreDocs(df: DataFrame, idCol: String, textCol: String,
                model: DataFrame, unseen: Option[Long] = None): DataFrame = {
    val bg = df.select(col(idCol), explode(charBigrams(col(textCol)))
      .as("bigram"))
    val m = broadcast(model.select(col("bigram"), col("lp_nano")))
    val joined = unseen match {
      case None => bg.join(m, Seq("bigram"))
      case Some(lp) => bg.join(m, Seq("bigram"), "left")
        .withColumn("lp_nano", coalesce(col("lp_nano"), lit(lp)))
    }
    joined.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp_nano")).as("__lp"))
      .select(col(idCol), col("n_bigrams"),
        round(col("__lp").cast("double") /
          col("n_bigrams").cast("double") / lit(1e9), 6).as("score"))
  }
}
