package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a rollup current by merging
  * the previous snapshot's PARTIAL STATES with the new batch's, instead
  * of rescanning history — the pattern that turns a daily 100 TB
  * re-aggregation into "scan today's partition + one state-grain
  * shuffle". The reference recomputes its monthly rollups from the full
  * staging table every run (sql/rollup_orders_monthly.sql); this is the
  * same result maintained incrementally, with merge ≡ recompute
  * certified by the oracle query.
  *
  * The state carries only MERGEABLE aggregates (count, sum, min, max —
  * the same algebra Spark's own partial aggregation uses between map
  * and reduce); derived values (avg) are computed at read time in
  * [[finish]], never stored. APPEND-ONLY semantics: a merge can absorb
  * new rows but cannot retract (deletes/updates need the CDC path,
  * [[graft.sinks.Merge]]).
  *
  * Scale shape: [[partial]] over a delta is one aggregate at state
  * grain; [[merge]] unions state frames (group-grain, small by
  * construction) and re-aggregates at the same grain. The full history
  * is never rescanned.
  */
object Incremental {

  private def stateCols(valueCol: String) = Seq(
    s"n_rows", s"sum_$valueCol", s"min_$valueCol", s"max_$valueCol")

  /** Canonical partial state of `value` at `keys` grain:
    * (keys..., n_rows, sum_v, min_v, max_v).
    */
  def partial(df: DataFrame, keys: Seq[String], value: Column,
              valueCol: String): DataFrame = {
    require(keys.nonEmpty, "no grouping keys")
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(value).as(s"sum_$valueCol"),
        min(value).as(s"min_$valueCol"),
        max(value).as(s"max_$valueCol"))
  }

  /** Merge partial states produced by [[partial]] with the same keys
    * and value column: count/sum add, min/max fold. Associative and
    * commutative, so snapshots can themselves be merged snapshots.
    */
  def merge(partials: Seq[DataFrame], keys: Seq[String],
            valueCol: String): DataFrame = {
    require(partials.nonEmpty, "nothing to merge")
    val expected = keys ++ stateCols(valueCol)
    partials.foreach { p =>
      require(p.columns.toSeq == expected,
        s"partial state columns ${p.columns.toSeq} != expected $expected")
    }
    partials.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n_rows")).as("n_rows"),
        sum(col(s"sum_$valueCol")).as(s"sum_$valueCol"),
        min(col(s"min_$valueCol")).as(s"min_$valueCol"),
        max(col(s"max_$valueCol")).as(s"max_$valueCol"))
  }

  /** Read-time finish: derive `avg_v` (rounded to 6 decimals — ONE
    * double division per group, no accumulated double error) from the
    * stored integer state.
    */
  def finish(state: DataFrame, valueCol: String): DataFrame =
    state.withColumn(s"avg_$valueCol",
      round(col(s"sum_$valueCol").cast("double") /
        col("n_rows").cast("double"), 6))
}
