package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exponentially time-decayed aggregation — the "what's trending NOW"
  * form of a count: each event contributes `2^(−age/halfLife)`, so a
  * burst last week outweighs a steady trickle last year. The batch twin
  * of a streaming decayed counter, and the ranking signal freshness-
  * aware heavy-hitter dashboards use instead of raw counts.
  *
  * Determinism discipline: the decayed sum is a double, but it is
  * computed over the (key, age-in-days) EXACT count grid, not per row —
  * ages are integers against a fixed `asOf`, so there are at most a few
  * thousand distinct weights, each multiplied by an exact long count.
  * The remaining tiny-grid double sum is the [[Stats.chiSquare]]
  * residual, absorbed by the 6-decimal rounding. (A per-row `pow` sum
  * at data grain would be order-dependent AND 10⁶× more transcendental
  * evaluations.)
  *
  * Scale shape: one exact aggregate to (key, age) grain — partial-
  * pushed, the grid is keys × horizon-days — then one keyed fold to key
  * grain. Two shuffles of grid-sized data; the raw table is read once.
  */
object Decay {

  /** Per-key decayed event count as of `asOf` (rows dated after `asOf`
    * are excluded — they haven't happened yet from the ranking's
    * viewpoint; a negative-age weight > 1 would silently dominate).
    *
    * @return `key cols..., n_raw, decayed_count` (6-decimal)
    */
  def decayedCounts(df: DataFrame, keys: Seq[String], eventDate: Column,
                    asOf: String, halfLifeDays: Double): DataFrame = {
    require(keys.nonEmpty, "no keys")
    require(halfLifeDays > 0, s"halfLifeDays=$halfLifeDays")
    val age = datediff(lit(asOf).cast("date"), eventDate.cast("date"))
    val grid = df
      .where(age >= 0)
      .groupBy((keys.map(col) :+ age.cast("long").as("__age")): _*)
      .agg(count(lit(1)).as("__n"))
    val weight = pow(lit(2.0),
      -col("__age").cast("double") / lit(halfLifeDays))
    grid.groupBy(keys.map(col): _*)
      .agg(sum(col("__n")).as("n_raw"),
        round(sum(col("__n").cast("double") * weight), 6)
          .as("decayed_count"))
  }
}
