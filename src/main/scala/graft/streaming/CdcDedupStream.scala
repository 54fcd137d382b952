package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TTLConfig, TimeMode}

import graft.llm.CdcChunks

/** Streaming content-defined-chunking dedup — the shift-robust rung of
  * the streaming dedup ladder ([[DedupStream]] whole-doc,
  * [[NearDupStream]] banded near, [[SegmentDedupStream]] fixed
  * segments, this = CDC chunks). Fixed segments lose every chunk after
  * a one-token upstream insertion; CDC boundaries realign, so the
  * first-arrival keeper state recognizes the recurring tail.
  *
  * The chunker is [[CdcChunks.chunksMapOnly]] — the window-free array
  * formulation exists precisely because Structured Streaming rejects
  * non-time windows; batch and streaming therefore cut IDENTICAL
  * chunks (spec-asserted), and the keeper rule, state shape, TTL and
  * parity discipline are [[SegmentDedupStream]]'s, reused verbatim:
  * one fixed-size `ValueState` per distinct chunk fingerprint, a
  * million-copy boilerplate chunk costing one entry however often it
  * arrives.
  */
object CdcDedupStream {

  /** Per-occurrence verdicts over a streaming (idCol, textCol) frame:
    * `kept` iff this chunk content's first arrival; `keeper_doc`/
    * `keeper_idx` name the owner. `seg_idx` carries the chunk index.
    */
  def chunkVerdicts(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 3, modulus: Int = 8,
                    ttl: TTLConfig = TTLConfig.NONE)
      : Dataset[SegmentDedupStream.SegVerdict] = {
    import docs.sparkSession.implicits._
    val rows = CdcChunks.chunksMapOnly(docs, idCol, textCol, k, modulus)
      .select(col(idCol).cast("long").as("id"),
        col("chunk_idx").cast("int").as("seg_idx"),
        col("fp").as("seg_fp"))
      .as[SegmentDedupStream.SegRow]
    rows.groupByKey(_.seg_fp)
      .transformWithState(new SegmentDedupStream.FirstKeeperProcessor(ttl),
        TimeMode.None(), OutputMode.Append(),
        Encoders.product[SegmentDedupStream.SegVerdict])
  }
}
