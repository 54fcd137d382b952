package graft.streaming

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming gap sessionization with CUSTOM state — the §2.7 surface the
  * built-in operators can't express: `dropDuplicatesWithinWatermark`
  * covers streaming dedup and `window()` covers fixed windows, but
  * gap-based sessions need per-key state that grows with open sessions
  * and closes on EVENT-TIME timeout, i.e.
  * `KeyValueGroupedDataset.flatMapGroupsWithState`.
  *
  * Semantics match the batch twin [[graft.ops.Windows.sessionize]]
  * (asserted in spec): events of one key belong to one session while
  * consecutive gaps are ≤ `gapSeconds`; a closed session emits
  * (user_id, session_start, session_end, n_events).
  *
  * State discipline (the 100 TB part):
  *  - state per key = the OPEN sessions only (a list of merged
  *    [start, end, n] intervals — out-of-order events inside the
  *    watermark merge correctly, late-beyond-watermark events are
  *    dropped by the watermark before they reach the state function);
  *  - a session closes, emits, and leaves the state as soon as the
  *    watermark passes `end + gap` — state size is bounded by open
  *    sessions per key, NOT by history;
  *  - an event-time timeout fires the close even when the key receives
  *    no further events (the no-data batch after watermark advance).
  */
object SessionizeStream {

  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Long)

  /** Open-session intervals as (startMicros, endMicros, nEvents). */
  case class OpenSessions(sessions: List[(Long, Long, Long)])

  private def micros(ts: Timestamp): Long = {
    val i = ts.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  private def fromMicros(us: Long): Timestamp =
    Timestamp.from(Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))

  def sessions(events: DataFrame, userCol: String, tsCol: String,
               gapSeconds: Long, watermarkDelay: String): Dataset[Session] = {
    require(gapSeconds > 0, s"gapSeconds=$gapSeconds")
    val spark = events.sparkSession
    import spark.implicits._
    val gapMicros = gapSeconds * 1000000L
    val src = events
      .select(col(userCol).cast("long").as("user_id"),
        col(tsCol).cast("timestamp").as("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[(Long, Timestamp)]

    src.groupByKey(_._1)
      .flatMapGroupsWithState[OpenSessions, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user, rows, state) =>
          val incoming = rows.map { case (_, ts) =>
            val us = micros(ts); (us, us, 1L)
          }.toList
          val prior = state.getOption.map(_.sessions).getOrElse(Nil)
          // merge sorted point/interval list under the gap tolerance;
          // out-of-order arrivals (within the watermark) sort into place
          val merged = (prior ++ incoming).sortBy(s => (s._1, s._2))
            .foldLeft(List.empty[(Long, Long, Long)]) { (acc, cur) =>
              acc match {
                case (s, e, n) :: tail if cur._1 - e <= gapMicros =>
                  (s, math.max(e, cur._2), n + cur._3) :: tail
                case _ => cur :: acc
              }
            }.reverse
          val wmMicros = state.getCurrentWatermarkMs() * 1000L
          val (closed, open) = merged.partition(_._2 + gapMicros < wmMicros)
          if (open.isEmpty) state.remove()
          else {
            state.update(OpenSessions(open))
            // wake when the earliest open session can close; must sit
            // strictly beyond the current watermark
            val closeAtMs = (open.map(_._2).min + gapMicros) / 1000L + 1L
            state.setTimeoutTimestamp(
              math.max(closeAtMs, state.getCurrentWatermarkMs() + 1L))
          }
          closed.sortBy(_._1).iterator.map { case (s, e, n) =>
            Session(user, fromMicros(s), fromMicros(e), n)
          }
      }
  }
}
