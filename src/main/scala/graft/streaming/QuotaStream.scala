package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues}

/** Streaming per-source admission quota — the unbounded-ingest twin of
  * [[graft.llm.Curation.sourceCap]] / [[graft.llm.Curation.quotaAllocate]]:
  * a corpus feed must cap each source ONLINE ("first N documents per
  * source per retention window"), not after a batch lands, or one
  * looping crawler floods the day's corpus before the nightly cap runs.
  *
  * Built on Spark 4's `transformWithState` arbitrary-state operator —
  * the current successor to `mapGroupsWithState` (typed per-key
  * `ValueState` with store-managed TTL, timers, and state-store
  * metrics). The processor keeps ONE long per source (the admitted
  * count): state size is |sources|, not rows — the 100 TB/day shape.
  * `TTLConfig` expires an idle source's counter, so the quota
  * naturally refreshes per retention window without a timer sweep.
  *
  * Every input row is emitted with an `admitted` flag (append mode,
  * no retraction): the downstream writer routes admitted rows to the
  * corpus and rejected ones to a quarantine/sample sink — dropping
  * silently would make the cap unauditable.
  */
object QuotaStream {

  /** (source, id, admitted) per input row. */
  case class Admission(source: String, id: Long, admitted: Boolean)

  /** Input row shape: a keyed document reference. */
  case class DocRef(source: String, id: Long)

  /** StatefulProcessor: admit the first `cap` rows per key; the
    * counter lives in a TTL'd ValueState.
    */
  class QuotaProcessor(cap: Long, ttl: TTLConfig)
      extends StatefulProcessor[String, DocRef, Admission] {
    @transient private var count: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long]("admitted_count",
        Encoders.scalaLong, ttl)

    override def handleInputRows(key: String, rows: Iterator[DocRef],
                                 timerValues: TimerValues): Iterator[Admission] = {
      var n = if (count.exists()) count.get() else 0L
      val out = rows.map { r =>
        val admit = n < cap
        if (admit) n += 1
        Admission(r.source, r.id, admit)
      }.toList // drain before writing state: the iterator is lazy
      count.update(n)
      out.iterator
    }
  }

  /** Wire the processor onto a streaming Dataset[DocRef]. */
  def admit(docs: Dataset[DocRef], cap: Long,
            ttl: TTLConfig = TTLConfig.NONE): Dataset[Admission] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .transformWithState(new QuotaProcessor(cap, ttl),
        TimeMode.None(), OutputMode.Append(), Encoders.product[Admission])
  }
}
