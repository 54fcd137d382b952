package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture diff between two snapshots of the same keyed
  * table: every key is classified `insert` (new only), `delete` (old
  * only), or `update` (present in both with at least one compared
  * attribute changed, null-safe); unchanged keys are dropped. The batch
  * complement of the reference's row-at-a-time `ON CONFLICT` upsert
  * (model_curated.py:72-101): instead of blindly overwriting, the diff
  * says exactly WHAT changed, which is what incremental downstream
  * consumers (SCD merges, cache invalidation, audit trails) need.
  *
  * Output schema: key columns, `change_type`, and `old_<c>` / `new_<c>`
  * for every compared column (null on the absent side).
  *
  * Scale shape: one key-grain full-outer shuffle join — both sides
  * partition on the key, nothing is collected, and Catalyst broadcasts
  * a small side automatically. Unchanged keys (the overwhelming
  * majority in a steady-state pipeline) are filtered before anything
  * else moves.
  */
object SnapshotDiff {

  def diff(oldSnap: DataFrame, newSnap: DataFrame,
           keys: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty && compareCols.nonEmpty, "keys and compareCols required")
    val o = oldSnap.select(keys.map(col) ++
      compareCols.map(c => col(c).as(s"old_$c")) :+ lit(true).as("__in_old"): _*)
    val n = newSnap.select(keys.map(col) ++
      compareCols.map(c => col(c).as(s"new_$c")) :+ lit(true).as("__in_new"): _*)
    val j = o.join(n, keys, "full_outer")
    val inOld = coalesce(col("__in_old"), lit(false))
    val inNew = coalesce(col("__in_new"), lit(false))
    val changed = compareCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c"))).reduce(_ || _)
    j.withColumn("change_type",
        when(!inOld, lit("insert"))
          .when(!inNew, lit("delete"))
          .when(changed, lit("update")))
      .where(col("change_type").isNotNull)
      .drop("__in_old", "__in_new")
  }
}
