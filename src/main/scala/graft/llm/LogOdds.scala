package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Characteristic terms of a sub-corpus: log-odds ratio with an
  * informative Dirichlet prior (Monroe, Colaresi & Quinn 2008,
  * "Fightin' Words") — the statistically-grounded replacement for raw
  * tf-ratio "what's different about slice X" comparisons, which
  * overweight rare terms. The prior pulls every term toward the pooled
  * corpus rate, and the z-score divides the shrunk log-odds delta by
  * its estimated standard deviation, so high-|z| terms are
  * characteristic BECAUSE the evidence is strong, not because the
  * counts are small.
  *
  * Determinism: per-term counts are exact integers from ONE conditional
  * aggregate; delta/sigma are scalar doubles computed from those
  * integers by one fixed expression tree, fixed-pointed to micro-units
  * for the ordering key — no cross-row double accumulation anywhere.
  *
  * Scale shape: one term-grain aggregate over the exploded token stream
  * (both sides counted in the SAME pass — no per-side scan, no join at
  * term grain), a 1-row totals broadcast (itself a map-only
  * `size(tokens)` aggregate, not a second explode), map-only scoring,
  * and a top-k order-limit. Cost ≈ one vocabulary build.
  */
object LogOdds {

  /** Top-k |z| terms between the `isGroupA` slice and the rest.
    *
    * @param isGroupA boolean column over `documents` splitting the
    *                 corpus (e.g. `col("lang") === "en"`)
    * @param alpha0   total Dirichlet prior mass, spread over terms
    *                 proportionally to their pooled frequency
    * @return (term, y_a, y_b, z) — z > 0 ⇒ characteristic of A;
    *         ordered by |z| desc, term
    */
  def characteristicTerms(documents: DataFrame, idCol: String,
                          textCol: String, isGroupA: Column,
                          alpha0: Double, topK: Int): DataFrame = {
    require(alpha0 > 0, s"alpha0=$alpha0")
    require(topK >= 1, s"topK=$topK")
    val counts = documents
      .select(explode(TextStats.tokens(col(textCol))).as("term"),
        isGroupA.as("is_a"))
      .groupBy(col("term"))
      .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("y_a"),
        sum(when(col("is_a"), 0L).otherwise(1L)).as("y_b"))
    // side totals are token COUNTS — a map-only size(tokens) scan, so
    // the corpus-wide explode runs once (for `counts`), not twice
    val totals = documents.agg(
      sum(when(isGroupA, TextStats.nTokensOf(TextStats.tokens(col(textCol))))
        .otherwise(0L)).as("n_a"),
      sum(when(isGroupA, 0L)
        .otherwise(TextStats.nTokensOf(TextStats.tokens(col(textCol)))))
        .as("n_b"))
    val ya = col("y_a").cast("double")
    val yb = col("y_b").cast("double")
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    // informative prior: alpha_w = alpha0 * pooled share of the term
    val aw = lit(alpha0) * (ya + yb) / (na + nb)
    val delta = log((ya + aw) / (na + lit(alpha0) - ya - aw)) -
      log((yb + aw) / (nb + lit(alpha0) - yb - aw))
    val sigma2 = lit(1.0) / (ya + aw) + lit(1.0) / (yb + aw)
    counts.crossJoin(broadcast(totals))
      .select(col("term"), col("y_a"), col("y_b"),
        round(delta / sqrt(sigma2) * lit(1e6)).cast("long").as("z_micro"))
      .orderBy(abs(col("z_micro")).desc, col("term"))
      .limit(topK)
      .select(col("term"), col("y_a"), col("y_b"),
        round(col("z_micro").cast("double") / lit(1e6), 6).as("z"))
  }
}
