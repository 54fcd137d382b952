package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues}

import graft.llm.MinHash

/** Streaming MinHash-LSH near-dedup — the unbounded-ingest twin of
  * [[graft.llm.Dedup.dropNearDups]] (SURVEY.md §2.7 extension surface),
  * completing the streaming dedup ladder above [[DedupStream]]'s exact
  * fingerprints.
  *
  * Batch near-dedup shuffles docs on (band index, band value) and
  * self-joins within buckets; the streaming form keeps the SAME key but
  * replaces the self-join with per-bucket STATE: each LSH band bucket
  * remembers the signatures it has admitted (a `ListState` on Spark 4's
  * `transformWithState`, the [[QuotaStream]] discipline), and every
  * incoming document is verified against its bucket's stored signatures
  * with the full k-permutation match count — the same estimate the
  * batch path computes between candidate pairs. "Previously seen"
  * under arrival order replaces the batch path's "lower id"; replaying
  * a corpus in id order therefore reproduces the batch verdicts
  * exactly (asserted in the parity spec).
  *
  * State bounds, the 100 TB/day shape:
  *  - retention: `TTLConfig` expires idle bucket entries, so state
  *    tracks the ingest window, not corpus history (re-crawls cluster
  *    in time — the [[DedupStream]] argument);
  *  - skew: `maxPerBucket` caps stored signatures per band bucket (the
  *    streaming twin of the batch hot-bucket caps). A saturated bucket
  *    still VERIFIES arrivals against its stored members but stops
  *    admitting new ones — conservative toward under-dropping, and the
  *    cap is part of the contract, not a silent truncation;
  *  - a flagged duplicate's signature is STILL stored (batch parity:
  *    [[graft.llm.Dedup.dropNearDups]] drops chains conservatively —
  *    b≈a and c≈b drops both b and c even though b is itself gone).
  *
  * Output is append-only per (doc, band): one [[NearDupStream.BandVerdict]]
  * for each of the doc's bands. A document is a near-dup iff ANY band
  * verdict is true — collapse downstream with
  * [[NearDupStream.collapseVerdicts]] (or route per-band audits to a
  * quarantine sink as-is; dropping silently would make the dedup
  * unauditable, the [[QuotaStream]] argument).
  */
object NearDupStream {

  /** One exploded (document × band) row entering the bucket state. */
  case class BandRow(id: Long, band_idx: Int, band_val: String,
                     sigs: Seq[String])

  /** A stored bucket member: doc id + its full k-signature. */
  case class StoredSig(id: Long, sigs: Seq[String])

  /** Per-(doc, band) verdict: `dup` iff some earlier doc in this band
    * bucket matched ≥ the signature threshold; `matched_id` is that
    * doc (-1 when none).
    */
  case class BandVerdict(id: Long, band_idx: Int, dup: Boolean,
                         matched_id: Long)

  /** StatefulProcessor keyed by `"bandIdx|bandVal"`: verify each
    * arrival against the bucket's stored signatures, then admit it to
    * the bucket (up to `maxPerBucket`). Rows within one micro-batch
    * group are processed in ascending id order so replays are
    * deterministic and id-ordered replays match the batch path.
    */
  class BandDedupProcessor(minMatchingSigs: Int, maxPerBucket: Int,
                           ttl: TTLConfig)
      extends StatefulProcessor[String, BandRow, BandVerdict] {
    @transient private var seen: ListState[StoredSig] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[StoredSig]("seen_sigs",
        Encoders.product[StoredSig], ttl)

    private def nMatching(a: Seq[String], b: Seq[String]): Int =
      a.iterator.zip(b.iterator).count { case (x, y) => x == y }

    override def handleInputRows(key: String, rows: Iterator[BandRow],
                                 timerValues: TimerValues): Iterator[BandVerdict] = {
      val stored = scala.collection.mutable.ArrayBuffer.from(seen.get())
      val out = rows.toSeq.sortBy(_.id).map { r =>
        val hit = stored.find(s => nMatching(s.sigs, r.sigs) >= minMatchingSigs)
        if (stored.length < maxPerBucket) {
          seen.appendValue(StoredSig(r.id, r.sigs))
          stored += StoredSig(r.id, r.sigs)
        }
        BandVerdict(r.id, r.band_idx, hit.isDefined, hit.fold(-1L)(_.id))
      }
      out.iterator
    }
  }

  /** Wire the near-dedup onto a streaming frame with (`idCol`,
    * `textCol`): MinHash signatures and band values are computed
    * STATELESSLY with the exact batch expressions
    * ([[graft.llm.MinHash.signatures]] / [[graft.llm.MinHash.bandCols]]
    * — same md5 permutation hashes, so batch and streaming agree on
    * what "near" means), then each doc explodes to its k/rowsPerBand
    * band rows and the bucket processor runs per band key.
    *
    * @param minEstJaccard verification threshold: flag when
    *        ⌈k·minEstJaccard⌉ of the k signature slots match
    * @param ttl bucket-entry retention (processing-time); NONE = keep
    *        for the life of the query
    */
  def nearDupVerdicts(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, k: Int = 8, rowsPerBand: Int = 2,
                      minEstJaccard: Double = 0.5,
                      maxPerBucket: Int = 1000,
                      ttl: TTLConfig = TTLConfig.NONE): Dataset[BandVerdict] = {
    require(k % rowsPerBand == 0, "k must divide into bands")
    require(minEstJaccard > 0.0 && minEstJaccard <= 1.0)
    val minMatching = math.ceil(k * minEstJaccard).toInt
    val nBands = k / rowsPerBand
    import docs.sparkSession.implicits._
    val sigs = MinHash.signatures(docs, idCol, textCol, n, k)
    val withBands = sigs.select(
      col(idCol) +: array((0 until k).map(p => col(s"sig_$p")): _*).as("sigs") +:
        MinHash.bandCols(k, rowsPerBand): _*)
    val bandRows = withBands.select(col(idCol).cast("long").as("id"),
        col("sigs"), posexplode(
          array((0 until nBands).map(b => col(s"band_$b")): _*))
          .as(Seq("band_idx", "band_val")))
      .select(col("id"), col("band_idx"), col("band_val"), col("sigs"))
      .as[BandRow]
    bandRows.groupByKey(r => s"${r.band_idx}|${r.band_val}")
      .transformWithState(
        new BandDedupProcessor(minMatching, maxPerBucket, ttl),
        TimeMode.None(), OutputMode.Append(), Encoders.product[BandVerdict])
  }

  /** Doc-grain collapse of the per-band verdicts (any band ⇒ dup):
    * run over the landed verdict table, or inline for batch frames.
    */
  def collapseVerdicts(verdicts: DataFrame): DataFrame =
    verdicts.groupBy(col("id"))
      .agg(max(col("dup")).as("dup"),
        max(when(col("dup"), col("matched_id"))).as("matched_id"))
}
