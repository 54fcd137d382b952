package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

import graft.llm.SegmentDedup

/** Streaming CCNet segment dedup — the unbounded-ingest twin of
  * [[graft.llm.SegmentDedup]], completing the streaming dedup ladder's
  * segment rung ([[DedupStream]] = whole-doc exact,
  * [[NearDupStream]] = banded near, this = sub-document boilerplate).
  *
  * Batch segment dedup keeps the lexicographically-FIRST `(doc,
  * seg_idx)` occurrence of each segment fingerprint; the streaming
  * form keeps the FIRST-ARRIVED occurrence — per fingerprint key, one
  * tiny `ValueState` remembering the keeper. Arrival order replaces
  * the batch total order, so replaying a corpus in `(doc, seg_idx)`
  * order reproduces the batch verdicts exactly (the
  * [[NearDupStream]] parity discipline, asserted in the spec).
  *
  * State bounds, the 100 TB/day shape: ONE fixed-size value per
  * distinct segment fingerprint in the retention window (`TTLConfig`
  * expires idle fingerprints — boilerplate recurs within the window or
  * stops mattering), and a million-copy boilerplate segment costs ONE
  * state entry however often it arrives. No caps needed: unlike the
  * near-dup bucket state, the per-key footprint cannot grow.
  *
  * Output is an append-only verdict stream, one row per segment
  * occurrence — `kept` marks the fingerprint's first arrival, and
  * `keeper_doc` names the occurrence that owns it (itself when kept).
  * Doc-grain rebuilds (edited text, digests) are a downstream batch
  * concern over the landed verdicts, same as
  * [[NearDupStream.collapseVerdicts]].
  */
object SegmentDedupStream {

  /** One segment occurrence entering the fingerprint state. */
  case class SegRow(id: Long, seg_idx: Int, seg_fp: String)

  /** The stored keeper of a fingerprint. */
  case class Keeper(id: Long, seg_idx: Int)

  /** Per-occurrence verdict: `kept` iff this row is the fingerprint's
    * first arrival; `keeper_doc`/`keeper_idx` name the owner.
    */
  case class SegVerdict(id: Long, seg_idx: Int, kept: Boolean,
                        keeper_doc: Long, keeper_idx: Int)

  /** StatefulProcessor keyed by segment fingerprint: first arrival
    * wins and is remembered; everyone else is marked removed. Rows
    * within one micro-batch group are processed in ascending
    * `(id, seg_idx)` order so id-ordered replays match the batch
    * keeper rule.
    */
  class FirstKeeperProcessor(ttl: TTLConfig)
      extends StatefulProcessor[String, SegRow, SegVerdict] {
    @transient private var keeper: ValueState[Keeper] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      keeper = getHandle.getValueState[Keeper]("keeper",
        Encoders.product[Keeper], ttl)

    override def handleInputRows(key: String, rows: Iterator[SegRow],
                                 timerValues: TimerValues): Iterator[SegVerdict] = {
      val out = rows.toSeq.sortBy(r => (r.id, r.seg_idx)).map { r =>
        val k = keeper.get()
        if (k == null) {
          keeper.update(Keeper(r.id, r.seg_idx))
          SegVerdict(r.id, r.seg_idx, kept = true, r.id, r.seg_idx)
        } else SegVerdict(r.id, r.seg_idx, kept = false, k.id, k.seg_idx)
      }
      out.iterator
    }
  }

  /** Wire the segment dedup onto a streaming frame with (`idCol`,
    * `textCol`): segments and fingerprints come from the exact batch
    * expressions ([[graft.llm.SegmentDedup.segments]] — same md5 over
    * the same w-token slices, so batch and streaming agree on what a
    * segment is), then the fingerprint-keyed keeper state marks each
    * occurrence.
    *
    * @param ttl fingerprint retention (processing-time); NONE = keep
    *            for the life of the query
    */
  def segmentVerdicts(docs: DataFrame, idCol: String, textCol: String,
                      w: Int = 16,
                      ttl: TTLConfig = TTLConfig.NONE): Dataset[SegVerdict] = {
    import docs.sparkSession.implicits._
    val segRows = SegmentDedup.segments(docs, idCol, textCol, w)
      .select(col(idCol).cast("long").as("id"), col("seg_idx"),
        col("seg_fp"))
      .as[SegRow]
    segRows.groupByKey(_.seg_fp)
      .transformWithState(new FirstKeeperProcessor(ttl),
        TimeMode.None(), OutputMode.Append(), Encoders.product[SegVerdict])
  }
}
