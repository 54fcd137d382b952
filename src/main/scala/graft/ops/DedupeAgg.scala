package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-grain dedupe aggregation + dimension loads (A1/A3/A6).
  *
  * Generic forms of the reference's collapse-to-PK-grain aggregation
  * (transform_lease.py:121-134) and `na.drop().dropDuplicates(pk)`
  * dimension loads (model_curated.py:143-166). One shuffle on the key;
  * Catalyst plans a partial (map-side) aggregate first, so at 100 TB the
  * shuffle carries pre-combined groups, not raw rows.
  */
object DedupeAgg {

  /** A1 — collapse duplicate rows to `keys` grain: pick-one semantics for
    * `attrs` (first non-null — or `min` when `deterministic`, identical
    * when attrs are group-constant and safe for hash-compared oracles),
    * `sum` for `measures`.
    */
  def dedupeAgg(df: DataFrame, keys: Seq[String], attrs: Seq[String],
                measures: Seq[String], deterministic: Boolean = false): DataFrame = {
    val pickers = attrs.map { a =>
      if (deterministic) min(col(a)).as(a)
      else first(col(a), ignoreNulls = true).as(a)
    }
    val sums = measures.map(m => sum(col(m)).as(m))
    val aggs = pickers ++ sums
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** A3 — duplicate-group diagnostic: groups at `keys` grain with >1 row. */
  def duplicateGroups(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).count()
      .where(col("count") > 1)
      .orderBy(col("count").desc)

  /** A6 — dimension load: drop null keys, one row per key. With duplicate
    * keys the survivor is arbitrary (same as the reference's
    * `dropDuplicates`); feed pre-deduped input when determinism matters.
    */
  def dimLoad(df: DataFrame, keys: Seq[String]): DataFrame =
    df.na.drop(keys).dropDuplicates(keys)
}
