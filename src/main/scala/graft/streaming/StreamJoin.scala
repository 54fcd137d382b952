package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream equi-join bounded in event time (SURVEY.md §2.7
  * extension surface) — the unbounded twin of the batch interval join
  * ([[graft.ops.RangeJoin]]).
  *
  * An unbounded ⋈ unbounded join is only executable when the engine can
  * prove it may FORGET state: the watermark on each side plus an
  * explicit time-proximity predicate bound how long a row can still
  * find a partner, so per-key state tracks the ingest window
  * (watermark + bound), not stream history — the same
  * state-stays-bounded discipline as [[DedupStream]] and
  * [[SessionizeStream]].
  */
object StreamJoin {

  /** Inner-join two streams on `keyCols` where the right event falls
    * within ± `bound` of the left event's time. Right-side key columns
    * are renamed internally, so both inputs may share key names; the
    * output carries the left names once plus both time columns.
    *
    * Inner only: outer stream-stream joins additionally delay
    * unmatched-row emission until the watermark closes the window —
    * callers who need that should extend this shape with `joinType` and
    * accept emission latency.
    *
    * @param watermarkDelay max event-time lateness on EACH side
    * @param bound half-width of the join window, e.g. "10 minutes"
    */
  def joinWithinTime(left: DataFrame, right: DataFrame,
                     keyCols: Seq[String], leftTs: String, rightTs: String,
                     watermarkDelay: String, bound: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(leftTs != rightTs,
      s"time columns must have distinct names, both are '$leftTs'")
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = keyCols.foldLeft(right)((df, k) =>
        df.withColumnRenamed(k, s"__r_$k"))
      .withWatermark(rightTs, watermarkDelay)
    val cond = keyCols.map(k => col(k) === col(s"__r_$k")).reduce(_ && _) &&
      col(rightTs) >= col(leftTs) - expr(s"INTERVAL $bound") &&
      col(rightTs) <= col(leftTs) + expr(s"INTERVAL $bound")
    l.join(r, cond, "inner").drop(keyCols.map("__r_" + _): _*)
  }
}
