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

  /** Case-folded, whitespace-collapsed text — THE canonical form
    * ([[TextStats.normalizedText]], the one [[TextStats.fingerprint]]
    * hashes); delegated so "normalized" can never mean two things.
    */
  def normalized(text: Column): Column = TextStats.normalizedText(text)

  /** Character bigrams of the normalized text (repeats kept — every
    * occurrence scores); empty for texts shorter than 2 chars.
    */
  def charBigrams(text: Column): Column = {
    val s = normalized(text)
    when(length(s) >= 2,
      transform(sequence(lit(1), length(s) - 1), i => s.substr(i, lit(2))))
      .otherwise(array().cast("array<string>"))
  }

  /** The exploded `(id, bigram)` stream — build once, feed
    * [[trainFromBigrams]] and [[scoreFromBigrams]] so normalization is
    * written once (same seam as `Dedup.winnowFingerprintTable`).
    *
    * Deliberately NOT checkpointed/persisted: this stream is
    * CORPUS-GRAIN (≈ chars-per-doc × docs rows — materializing it at
    * 100 TB means petabytes of checkpoint storage; the sf100 gate
    * found exactly that, an OOM storing 7.5e9 exploded rows that no
    * memory/disk budget holds). Train-then-score consumers recompute
    * the map-only explode twice instead — two streaming passes over
    * the scan, which is the shape that survives any scale.
    */
  def bigramTable(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("__id"),
        explode(charBigrams(col(textCol))).as("bigram"))

  /** Train: `(bigram, cnt, lp_nano)` where `lp_nano` is the add-one
    * smoothed log-probability `ln((cnt+1)/(total+V))` in nano-units
    * (BIGINT). Smoothing keeps unseen bigrams finite when scoring text
    * the model was not trained on; [[unseenLpNano]] is that default.
    */
  def trainBigramModel(df: DataFrame, textCol: String): DataFrame =
    trainFromBigrams(
      df.select(explode(charBigrams(col(textCol))).as("bigram")))

  /** [[trainBigramModel]] over a pre-built [[bigramTable]] (any frame
    * with a `bigram` column).
    */
  def trainFromBigrams(bg: DataFrame): DataFrame = {
    val counts = bg
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
    // HALF_UP, not math.round (half-toward-+∞): the model's lp_nano
    // rounds away from zero (Spark/DuckDB round), and the unseen
    // default must sit on the same grid
    BigDecimal(math.log(1.0 / (r.getDouble(0) + r.getDouble(1))) * 1e9)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
  }

  /** Score: `(id, n_bigrams, score)` with `score` = mean bigram
    * log-likelihood (6dp). `unseen = None` scores strictly (inner join —
    * right when scoring the training corpus itself); `Some(lpNano)`
    * left-joins with that default for out-of-model bigrams.
    */
  def scoreDocs(df: DataFrame, idCol: String, textCol: String,
                model: DataFrame, unseen: Option[Long] = None): DataFrame =
    scoreFromBigrams(
      df.select(col(idCol).as("__id"),
        explode(charBigrams(col(textCol))).as("bigram")),
      model, unseen)
      .withColumnRenamed("__id", idCol)

  /** [[scoreDocs]] over a pre-built [[bigramTable]] — pair with
    * [[trainFromBigrams]] on the same table to run the text pipeline
    * once for a train-then-score pass. Output id column is `__id`.
    */
  def scoreFromBigrams(bg: DataFrame, model: DataFrame,
                       unseen: Option[Long] = None): DataFrame =
    scoreSumsFromBigrams(bg, model, unseen)
      .select(col("__id"), col("n_bigrams"),
        round(col("lp_sum").cast("double") /
          col("n_bigrams").cast("double") / lit(1e9), 6).as("score"))

  /** The exact form under [[scoreFromBigrams]]: `(__id, n_bigrams,
    * lp_sum)` with `lp_sum` the raw BIGINT nano-unit sum — for
    * consumers that need to keep computing exactly (tertile cutoffs,
    * rankings) instead of taking the 6dp display rounding.
    */
  def scoreSumsFromBigrams(bg: DataFrame, model: DataFrame,
                           unseen: Option[Long] = None): DataFrame = {
    val m = broadcast(model.select(col("bigram"), col("lp_nano")))
    val joined = unseen match {
      case None => bg.join(m, Seq("bigram"))
      case Some(lp) => bg.join(m, Seq("bigram"), "left")
        .withColumn("lp_nano", coalesce(col("lp_nano"), lit(lp)))
    }
    joined.groupBy(col("__id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp_nano")).as("lp_sum"))
  }

  /** CCNet's head/middle/tail perplexity partition, per group (CCNet
    * §4.3: score documents with a reference LM, split each language's
    * corpus into three perplexity buckets — "head" the most fluent).
    * Scale-first construction: the per-document mean log-likelihood is
    * floored onto an integer MILLI-nat grid (exact long arithmetic —
    * `floor(1000·lp_sum/n_bigrams/1e9)` computed as a floordiv, no
    * doubles), tertile CUTOFF VALUES are selected from per-group
    * cumulative counts over that bounded grid (a window over ≤ a few
    * thousand grid cells per group, never over documents), and bucket
    * assignment is one broadcast join + comparison — the
    * train-cutoffs-then-map-only shape CCNet itself uses, instead of a
    * corpus-wide ntile sort that would serialize a language into one
    * task. Ties at a cutoff take the better bucket, so bucket sizes
    * are ceil(n/3) up to tie inflation — the documented contract.
    *
    * @param scored (groupCol, m_milli) rows — one per document
    * @return (groupCol, bucket 1|2|3) at document grain
    */
  def tertileByGrid(scored: DataFrame, groupCol: String,
                    gridCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grid = scored.groupBy(col(groupCol), col(gridCol))
      .agg(count(lit(1)).as("__n"))
    // cumulative docs from the top of the grid (bounded per group)
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(gridCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = grid.withColumn("__cum", sum(col("__n")).over(w))
    val totals = grid.groupBy(col(groupCol))
      .agg(sum(col("__n")).as("__nl"))
    // ceil(n/3) and ceil(2n/3) as exact small-int arithmetic
    def ceil3(x: Column): Column = floor((x + lit(2)) / lit(3)).cast("long")
    val cuts = cum.join(broadcast(totals), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(
        max(when(col("__cum") >= ceil3(col("__nl")), col(gridCol)))
          .as("__cut1"),
        max(when(col("__cum") >= ceil3(col("__nl") * 2), col(gridCol)))
          .as("__cut2"))
    scored.join(broadcast(cuts), Seq(groupCol))
      .withColumn("bucket",
        when(col(gridCol) >= col("__cut1"), lit(1))
          .when(col(gridCol) >= col("__cut2"), lit(2))
          .otherwise(lit(3)))
      .drop("__cut1", "__cut2")
  }
}
