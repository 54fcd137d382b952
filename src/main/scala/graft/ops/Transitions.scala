package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order event-transition model (Markov bigram counts): for each
  * entity's time-ordered event stream, count consecutive (from → to)
  * type pairs and normalize per source state — the transition matrix
  * behind next-action prediction, funnel-drop-off diagnosis, and
  * session anomaly scoring. (Sequence sibling of [[Funnel]].)
  *
  * Scale shape: one per-entity window pass (`lead` in time order) over
  * the stream, then a (from, to)-grain aggregate whose output is the
  * type-alphabet square, not data volume; the probability normalizer is
  * a window over that tiny grid.
  */
object Transitions {

  /** `(from_type, to_type, n_transitions, p)` where `p` (rounded to 6
    * decimals) is `n / Σ n` over the same `from_type`. Ordering ties on
    * identical timestamps break by type for engine-stable pairing.
    */
  def transitionCounts(events: DataFrame, entityCol: String, tsCol: String,
                       typeCol: String): DataFrame = {
    val byTime = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol), col(typeCol))
    val pairs = events
      .select(col(entityCol), col(typeCol).as("from_type"),
        lead(col(typeCol), 1).over(byTime).as("to_type"))
      .where(col("to_type").isNotNull)
    val counts = pairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val bySource = Window.partitionBy(col("from_type"))
    counts.withColumn("p",
      round(col("n_transitions").cast("double") /
        sum(col("n_transitions")).over(bySource).cast("double"), 6))
  }

  /** Per-entity sequence likelihood under the corpus's own first-order
    * transition model — session ANOMALY scoring: a user whose event
    * stream keeps taking transitions the population rarely takes (bot
    * loops, broken clients, scripted abuse) sinks to the bottom by mean
    * log-likelihood, no labels needed. The event-stream sibling of
    * [[graft.llm.LangModel]]'s char-bigram document scoring, with the
    * same cross-engine exactness discipline: log-probabilities are
    * rounded ONCE to integer nano-units on the FULL V×V state grid
    * (add-one smoothing keeps unseen cells finite, and gridding means
    * even transitions first seen at scoring time hit a precomputed
    * cell), so per-entity sums are BIGINT-exact and order-invariant.
    *
    * Scale shape: the same per-entity `lead` pass as
    * [[transitionCounts]]; the model is the V² grid (V = distinct event
    * types) built from a V-row collect-free crossJoin of the tiny state
    * frames and BROADCAST onto the pair stream; one entity-grain
    * aggregate ends the job.
    *
    * @return `entityCol, n_transitions, ll_nano, mean_ll` (6-decimal
    *         mean ln-likelihood per transition)
    */
  def sequenceLikelihood(events: DataFrame, entityCol: String, tsCol: String,
                         typeCol: String): DataFrame = {
    val byTime = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol), col(typeCol))
    val pairs = events
      .select(col(entityCol), col(typeCol).as("from_type"),
        lead(col(typeCol), 1).over(byTime).as("to_type"))
      .where(col("to_type").isNotNull)
    val counts = pairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("__n"))
    val states = events.select(col(typeCol).as("__state"))
      .where(col("__state").isNotNull).distinct()
    val v = states.agg(count(lit(1)).as("__v"))
    val fromTotals = counts.groupBy(col("from_type"))
      .agg(sum(col("__n")).as("__n_from"))
    // full V×V grid: every (from, to) cell gets its smoothed lp_nano,
    // including never-observed transitions (numerator 1); states that
    // never START a transition (pure terminals) have no from-total and
    // smooth over 0
    val grid = states.select(col("__state").as("from_type"))
      .crossJoin(states.select(col("__state").as("to_type")))
      .join(counts, Seq("from_type", "to_type"), "left")
      .join(fromTotals, Seq("from_type"), "left")
      .crossJoin(broadcast(v))
      .select(col("from_type"), col("to_type"),
        round(log((coalesce(col("__n"), lit(0L)).cast("double") + 1.0) /
          (coalesce(col("__n_from"), lit(0L)).cast("double") +
            col("__v").cast("double"))) * lit(1e9)).cast("long")
          .as("lp_nano"))
    pairs.join(broadcast(grid), Seq("from_type", "to_type"))
      .groupBy(col(entityCol))
      .agg(count(lit(1)).as("n_transitions"),
        sum(col("lp_nano")).as("ll_nano"))
      .select(col(entityCol), col("n_transitions"), col("ll_nano"),
        round(col("ll_nano").cast("double") /
          col("n_transitions").cast("double") / lit(1e9), 6).as("mean_ll"))
  }

  /** Most-common opening paths: each entity's first `maxLen` event
    * types in (ts, type, tie) order joined with `>`, counted across
    * entities, top `k` by (count desc, path asc) — the "how do users
    * actually start" view behind every funnel hypothesis, and the
    * aggregate [[transitionCounts]]' pairwise matrix can't show
    * (a matrix loses ORDER beyond adjacent pairs).
    *
    * Shape: one entity-grain aggregate (`collect_list` → array sort →
    * prefix slice — per-entity memory is the event count, bounded by
    * the same reality that bounds any sessionization), one path-grain
    * count, a k-row final sort. The tie column must make the per-
    * entity order total or the path string is nondeterministic.
    */
  def topPaths(events: DataFrame, entityCol: String, tsCol: String,
               typeCol: String, tieCol: String, maxLen: Int = 5,
               k: Int = 20): DataFrame = {
    require(maxLen >= 1 && k >= 1, s"maxLen=$maxLen k=$k")
    val paths = events
      .groupBy(col(entityCol))
      .agg(array_sort(collect_list(struct(
        col(tsCol).as("t"), col(typeCol).as("y"), col(tieCol).as("b"))))
        .as("__seq"))
      .select(array_join(
        expr(s"transform(slice(__seq, 1, $maxLen), x -> x.y)"), ">")
        .as("path"))
    paths.groupBy(col("path")).agg(count(lit(1)).as("n_entities"))
      .orderBy(col("n_entities").desc, col("path"))
      .limit(k)
  }
}
