package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence: support / confidence / lift / PMI for
  * item pairs that appear in the same basket — the association-rule
  * core of "customers who bought X also bought Y", and (at token/source
  * grain) the co-occurrence statistics behind PMI-based collocation
  * mining over a corpus.
  *
  * Scale shape: the ONLY quadratic step is the within-basket pair
  * explosion, and its fanout is items-per-basket² — bounded by
  * `maxItemsPerBasket`, never corpus size. Baskets over the cap are
  * DROPPED (a 10⁴-item basket is a degenerate catalog scan, and its
  * 10⁸ pairs would dominate the join while carrying no signal — the
  * standard frequency-cap discipline, same as the dedup family's
  * `maxDocsPerFp`). Everything else is keyed: item marginals at item
  * grain, the pair aggregate at pair grain, a 1-row basket-count
  * broadcast.
  *
  * Determinism: counts are exact longs; support/confidence/lift are
  * closed-form doubles rounded to 6; PMI is `ln(lift)` on the already-
  * exact ratio.
  */
object Basket {

  /** Item-pair association stats over distinct (basket, item) pairs.
    * Pairs are emitted once with `item_a < item_b` (lexicographic);
    * `confidence_ab` = P(b|a), `confidence_ba` = P(a|b).
    *
    * @return `item_a, item_b, n_ab, n_a, n_b, support, confidence_ab,
    *         confidence_ba, lift, pmi`
    */
  def coOccurrence(df: DataFrame, basketCol: String, itemCol: String,
                   maxItemsPerBasket: Int = 64): DataFrame = {
    require(maxItemsPerBasket >= 2, s"maxItemsPerBasket=$maxItemsPerBasket")
    val bi = df.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .where(col("__i").isNotNull)
      .distinct()
    // NOT checkpointed despite 4 references (r13, measured): AQE
    // exchange reuse already dedupes the identical basket subtree, and
    // an eager checkpoint A/B'd flat (0.97x) while adding an action
    val kept = bi.withColumn("__sz",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("__b"))))
      .where(col("__sz") <= maxItemsPerBasket)
      .select(col("__b"), col("__i"))
    val nBaskets = kept.agg(count_distinct(col("__b")).as("__n_baskets"))
    val marginals = kept.groupBy(col("__i")).agg(count(lit(1)).as("__n_i"))
    val pairs = kept.as("l")
      .join(kept.as("r"), col("l.__b") === col("r.__b") &&
        col("l.__i") < col("r.__i"))
      .groupBy(col("l.__i").as("item_a"), col("r.__i").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
    val withM = pairs
      .join(marginals.withColumnRenamed("__i", "item_a")
        .withColumnRenamed("__n_i", "n_a"), "item_a")
      .join(marginals.withColumnRenamed("__i", "item_b")
        .withColumnRenamed("__n_i", "n_b"), "item_b")
      .crossJoin(broadcast(nBaskets))
    val n = col("__n_baskets").cast("double")
    val lift = col("n_ab").cast("double") * n /
      (col("n_a").cast("double") * col("n_b").cast("double"))
    withM.select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"),
      col("n_b"),
      round(col("n_ab").cast("double") / n, 6).as("support"),
      round(col("n_ab").cast("double") / col("n_a").cast("double"), 6)
        .as("confidence_ab"),
      round(col("n_ab").cast("double") / col("n_b").cast("double"), 6)
        .as("confidence_ba"),
      round(lift, 6).as("lift"),
      round(log(lift), 6).as("pmi"))
  }
}
