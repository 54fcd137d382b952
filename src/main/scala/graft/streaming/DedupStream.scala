package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.TextStats

/** Streaming exact dedup — the unbounded-ingest twin of
  * [[graft.llm.Dedup.dropExactDups]] (SURVEY.md §2.7 extension surface).
  *
  * Batch dedup keys a shuffle on the content fingerprint; the streaming
  * form keeps the same key but must bound its state: an unbounded corpus
  * stream cannot remember every fingerprint forever. Spark's
  * `dropDuplicatesWithinWatermark` holds each fingerprint only while the
  * event-time watermark can still admit a duplicate, so state size tracks
  * the ingest window, not corpus size — the property that makes streaming
  * dedup viable at 100 TB/day (duplicates in real feeds cluster in time:
  * re-crawls and re-posts arrive near the original).
  */
object DedupStream {

  /** Fingerprint the text column and drop rows whose fingerprint was
    * already seen within the watermark window. Output carries the
    * `fingerprint` column (md5 of normalized text — same key as the batch
    * path, so batch and streaming dedup agree on what "identical" means).
    *
    * @param watermarkDelay how late a duplicate may arrive and still be
    *        dropped, e.g. "10 minutes" — also the state retention bound.
    */
  def dropDupsStream(docs: DataFrame, textCol: String, tsCol: String,
                     watermarkDelay: String): DataFrame =
    docs.withColumn("fingerprint", TextStats.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("fingerprint")
}
