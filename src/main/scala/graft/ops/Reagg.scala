package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental re-aggregation: coarsen a PRE-AGGREGATE instead of
  * re-scanning the facts. At 100 TB the monthly rollup is produced
  * incrementally month by month ([[graft.sinks.Idempotent]] slices);
  * quarterly/yearly reports then aggregate the rollup — KBs per
  * group — not the fact table. Correct only for MERGEABLE measures,
  * which is why the contract is explicit here: sums and counts merge by
  * sum (a count IS a sum of partial counts), mins by min, maxes by max.
  * Non-mergeable aggregates must be carried as mergeable parts: avg as
  * (sum, count), distinct counts as a sketch
  * (e.g. [[graft.functions.MinHashAgg]]-style digests or HLL).
  */
object Reagg {

  /** Merge `pre` (a finer-grain pre-aggregate) up to the grain of
    * `keys`. Measure columns keep their names, so a coarsening chain
    * (day → month → quarter → year) composes.
    */
  def coarsen(pre: DataFrame, keys: Seq[Column],
              sums: Seq[String] = Nil, mins: Seq[String] = Nil,
              maxs: Seq[String] = Nil): DataFrame = {
    val aggs = sums.map(c => sum(col(c)).as(c)) ++
      mins.map(c => min(col(c)).as(c)) ++
      maxs.map(c => max(col(c)).as(c))
    require(aggs.nonEmpty, "no mergeable measures given")
    pre.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
  }
}
