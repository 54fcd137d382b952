package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention: group entities by when they first appeared (their
  * cohort), then count how many are active again at each later offset —
  * the triangle chart behind every "day-N retention" metric.
  * (Extension surface; the reference has no longitudinal operators.)
  *
  * Scale shape: first-seen is one entity-grain aggregate; activity
  * joins back on the entity key (broadcast when the cohort table is
  * small); the final (cohort, offset) aggregate is the only other
  * shuffle, and distinct-entity counting stays inside it.
  */
object Cohorts {

  /** `(cohort_day, offset_days, n_active)`: `cohort_day` = the DATE of
    * the entity's earliest event, `offset_days` ≥ 0 the day distance of
    * each later activity, `n_active` the DISTINCT entities from that
    * cohort active at that offset (offset 0 = cohort size).
    */
  def retentionDaily(events: DataFrame, entityCol: String,
                     tsCol: String): DataFrame = {
    val firstSeen = events.groupBy(col(entityCol))
      .agg(to_date(min(col(tsCol))).as("cohort_day"))
    events.select(col(entityCol), to_date(col(tsCol)).as("__day"))
      .join(firstSeen, entityCol)
      .select(col("cohort_day"),
        datediff(col("__day"), col("cohort_day")).as("offset_days"),
        col(entityCol))
      .groupBy(col("cohort_day"), col("offset_days"))
      .agg(count_distinct(col(entityCol)).as("n_active"))
  }
}
