package graft.streaming

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming conversion funnel with CUSTOM state — the live twin of
  * [[graft.ops.Funnel]]: as events arrive, each entity's progress
  * through the required step sequence advances and every first reach of
  * a step emits immediately-after-settlement. Batch parity is exact
  * (asserted in spec): step k's time is the earliest step-k event
  * STRICTLY AFTER step k-1's time.
  *
  * Event-time correctness under reordering: an event only ADVANCES the
  * funnel once the watermark passes it (earlier events can no longer
  * arrive), so out-of-order arrivals within the watermark sort into
  * place before any verdict is taken, and the emitted reach times are
  * deterministic — the same discipline as [[SessionizeStream]], applied
  * to ordered-sequence state.
  *
  * State discipline (the 100 TB part):
  *  - state per entity = funnel progress (two longs) + ONLY the not-yet
  *    -settled events of the funnel's own types — bounded by the
  *    watermark delay × per-entity funnel-event rate, not history;
  *  - completed entities KEEP a two-long completion marker (pending
  *    always empty) so later events can never restart the funnel and
  *    duplicate reaches — the marker is the price of exactly-once
  *    reach semantics over an unbounded stream;
  *  - an event-time timeout processes pending events when the
  *    watermark advances without new data for the key.
  */
object FunnelStream {

  case class StepReach(entity: Long, step: Int, step_type: String,
                       reached_at: Timestamp)

  /** reached = steps completed; reachedAt = micros of the last completed
    * step; pending = unsettled (micros, stepIdx).
    */
  case class FunnelState(reached: Int, reachedAtMicros: Long,
                         pending: List[(Long, Int)])

  private def micros(ts: Timestamp): Long = {
    val i = ts.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  private def fromMicros(us: Long): Timestamp =
    Timestamp.from(Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))

  def stepReaches(events: DataFrame, entityCol: String, tsCol: String,
                  typeCol: String, steps: Seq[String],
                  watermarkDelay: String): Dataset[StepReach] = {
    require(steps.nonEmpty, "steps required")
    require(steps.distinct == steps, "funnel steps must be distinct")
    val spark = events.sparkSession
    import spark.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    val src = events
      .where(col(typeCol).isin(steps: _*)) // only funnel types reach state
      .select(
        // a silently-null cast would merge every entity into one null
        // group — fail loudly instead (batch Funnel takes any id type;
        // the streaming state key is long)
        when(col(entityCol).isNotNull && col(entityCol).cast("long").isNull,
          raise_error(lit("FunnelStream: entity id is not long-castable")))
          .otherwise(col(entityCol).cast("long")).as("entity"),
        col(tsCol).cast("timestamp").as("ts"), col(typeCol).as("typ"))
      .withWatermark("ts", watermarkDelay)
      .as[(Long, Timestamp, String)]

    src.groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, StepReach](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (entity, rows, state) =>
          val prior = state.getOption.getOrElse(FunnelState(0, Long.MinValue, Nil))
          val incoming = rows.map { case (_, ts, typ) =>
            (micros(ts), stepIdx(typ))
          }.toList
          val wm = state.getCurrentWatermarkMs() * 1000L
          // settle: only events the watermark has passed may advance the
          // funnel (nothing earlier can still arrive); process them in
          // (time, step) order — a step event simultaneous with the
          // previous step's reach is excluded by the strict >
          val (settled, still) = (prior.pending ++ incoming)
            .partition(_._1 <= wm)
          var reached = prior.reached
          var reachedAt = prior.reachedAtMicros
          val emits = List.newBuilder[StepReach]
          settled.sortBy(identity).foreach { case (us, idx) =>
            if (idx == reached && (reached == 0 || us > reachedAt)) {
              reached += 1
              reachedAt = us
              emits += StepReach(entity, reached, steps(reached - 1),
                fromMicros(us))
            }
          }
          if (reached == steps.size) {
            // completion marker: pending dropped, progress kept so a
            // later event can never restart the funnel (exactly-once
            // reaches; the batch twin likewise never re-reaches)
            state.update(FunnelState(reached, reachedAt, Nil))
          } else if (still.isEmpty && reached == 0) {
            if (state.exists) state.remove() // nothing to remember
          } else {
            state.update(FunnelState(reached, reachedAt, still))
            if (still.nonEmpty) {
              // wake when the earliest pending event settles; must sit
              // strictly beyond the current watermark
              val wakeMs = still.map(_._1).min / 1000L + 1L
              state.setTimeoutTimestamp(
                math.max(wakeMs, state.getCurrentWatermarkMs() + 1L))
            }
          }
          emits.result().iterator
      }
  }
}
