package graft.llm

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** PMI collocation mining — the phrase-discovery pass of corpus
  * analysis: adjacent token pairs that co-occur far more than their
  * unigram frequencies predict ("new york", "machine learning"), by
  * pointwise mutual information `ln(P(ab) / (P(a)·P(b)))` with the
  * standard minimum-count gate (PMI without it surfaces hapax noise).
  *
  * Scale shape: a map-only bigram explode (fanout = tokens − 1 per
  * document), exact bigram- and unigram-grain count aggregates, keyed
  * marginal joins at bigram grain, a 1-row total broadcast, and a
  * top-k ORDER/LIMIT that AQE executes as a partial top-k — no stage
  * touches pairs beyond what the corpus contains.
  *
  * Determinism: all counts exact longs; PMI is one closed-form double
  * expression, rounded to 6 BEFORE the ranking sort, with (w1, w2) as
  * total tiebreak.
  */
object Collocations {

  /** Top-`k` adjacent-pair collocations with `n_ab >= minCount`:
    * `w1, w2, n_ab, n_a, n_b, pmi` ranked by (pmi desc, w1, w2).
    * Marginals are corpus unigram occurrence counts; the pair total
    * normalizes P(ab).
    */
  def pmiBigrams(df: DataFrame, textCol: String, minCount: Long,
                 k: Int): DataFrame = {
    require(minCount >= 1, s"minCount=$minCount")
    require(k >= 1, s"k=$k")
    val toks = df.select(TextStats.tokens(col(textCol)).as("__toks"))
    val bi = toks.where(size(col("__toks")) >= 2)
      .select(expr(
        """explode(transform(sequence(1, size(__toks) - 1),
          |  i -> struct(element_at(__toks, i) as w1,
          |              element_at(__toks, CAST(i + 1 AS INT)) as w2)))"""
          .stripMargin).as("g"))
      .select(col("g.w1").as("w1"), col("g.w2").as("w2"))
    val uni = toks.select(explode(col("__toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("__n_w"))
    val pairs = bi.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minCount)
    // Σ max(len−1, 0) ≡ the bigram count — a cheap array-length
    // aggregate instead of re-running the corpus-scale explode
    val total = toks.agg(
      coalesce(sum(greatest(size(col("__toks")) - 1, lit(0)).cast("long")),
        lit(0L)).as("__n_bi"))
    val pmi = log(col("n_ab").cast("double") * col("__n_bi").cast("double") /
      (col("n_a").cast("double") * col("n_b").cast("double")))
    pairs
      .join(uni.select(col("w").as("w1"), col("__n_w").as("n_a")), "w1")
      .join(uni.select(col("w").as("w2"), col("__n_w").as("n_b")), "w2")
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("n_ab"), col("n_a"), col("n_b"),
        round(pmi, 6).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }
}
