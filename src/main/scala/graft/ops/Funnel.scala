package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered funnel analysis: how far does each entity progress through a
  * required sequence of event types? Step 1's time is the entity's
  * earliest step-1 event; step k's time is the earliest step-k event
  * STRICTLY AFTER the entity's step k-1 time — the standard conversion
  * funnel semantics (re-visiting an earlier step never rewinds
  * progress, simultaneous events don't double-advance). (Extension
  * surface next to [[Windows.sessionize]]; the reference has no
  * event-sequence operators.)
  *
  * Scale shape: the event stream is pre-filtered to the funnel's types
  * once, then each step is an entity-grain aggregate + entity-grain
  * join with the previous step's times — k-1 co-keyed shuffles for a
  * k-step funnel, no window over the raw stream, no per-entity event
  * collection.
  */
object Funnel {

  /** One row per entity that completed step 1, with nullable
    * `t_1 … t_k` first-reach times (null = never reached).
    */
  def stepTimes(events: DataFrame, entityCol: String, tsCol: String,
                typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "steps required")
    require(steps.distinct == steps, "funnel steps must be distinct")
    val relevant = events
      .where(col(typeCol).isin(steps: _*))
      .select(col(entityCol), col(tsCol), col(typeCol))
    val first = relevant.where(col(typeCol) === steps.head)
      .groupBy(col(entityCol))
      .agg(min(col(tsCol)).as("t_1"))
    steps.zipWithIndex.drop(1).foldLeft(first) { case (acc, (step, i)) =>
      val reached = relevant.where(col(typeCol) === step)
        .join(acc.select(col(entityCol), col(s"t_$i")), entityCol)
        .where(col(tsCol) > col(s"t_$i"))
        .groupBy(col(entityCol))
        .agg(min(col(tsCol)).as(s"t_${i + 1}"))
      acc.join(reached, Seq(entityCol), "left")
    }
  }

  /** Funnel summary: `(step, step_type, n_entities)` — entities whose
    * `t_step` is non-null, one row per step in order. ONE aggregate
    * over the step-times frame (all k counts in a single pass, then an
    * explode of the k-element result row) — a per-step union of
    * aggregates would re-execute the whole join chain k times.
    */
  def summary(events: DataFrame, entityCol: String, tsCol: String,
              typeCol: String, steps: Seq[String]): DataFrame = {
    val times = stepTimes(events, entityCol, tsCol, typeCol, steps)
    val counts = steps.indices
      .map(i => count(col(s"t_${i + 1}")).as(s"__c_${i + 1}"))
    val rows = steps.zipWithIndex.map { case (step, i) =>
      struct(lit(i + 1).as("step"), lit(step).as("step_type"),
        col(s"__c_${i + 1}").as("n_entities"))
    }
    times.agg(counts.head, counts.tail: _*)
      .select(explode(array(rows: _*)).as("r"))
      .select(col("r.step"), col("r.step_type"), col("r.n_entities"))
      .orderBy(col("step"))
  }
}
