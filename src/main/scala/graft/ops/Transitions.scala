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
}
