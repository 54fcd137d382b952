package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Golden-record attribute survivorship — the step AFTER record linkage
  * ([[Linkage]]) and cluster closure ([[ConnectedComponents]]): collapse
  * each entity's duplicate records to ONE row, picking every attribute
  * by an explicit, deterministic rule. The reference's dimension upsert
  * (S8) keeps "last write wins" per key; this generalizes that to the
  * master-data rules a real entity-resolution pipeline needs.
  *
  * Every rule is a COMMUTATIVE aggregate (struct-max / struct-min), not
  * a window sort: partial aggregation combines map-side, so a
  * billion-record entity costs one keyed shuffle of one small struct
  * per rule — the scale-correct shape. (A `row_number` formulation
  * would sort every record of every entity; equivalent output, strictly
  * worse plan.) Ties are broken inside the struct ordering, so results
  * are bit-stable under any partitioning.
  */
object Survivorship {

  /** Value of `value` on the record with the greatest `recency` (ties →
    * greatest `tie`): "most recent non-null wins". Rows with null
    * `value` are skipped outright; a null `recency` sorts below every
    * non-null one under struct max, so dated records always beat
    * undated ones.
    */
  def mostRecent(recency: Column, tie: Column, value: Column): Column =
    max(when(value.isNotNull,
      struct(recency.as("r"), tie.as("t"), value.as("v")))).getField("v")

  /** Most frequent value; ties broken by the SMALLEST value, so the
    * result is independent of arrival and partition order. Implemented
    * as (count, value)-grain pre-aggregation by the caller — see
    * [[modalValue]] for the composed two-stage form.
    */
  def modalPick(n: Column, value: Column): Column =
    min(struct((-n).as("neg_n"), value.as("v"))).getField("v")

  /** Two-stage modal value of `valueCol` per `keyCols`: stage 1 counts
    * at (key, value) grain, stage 2 struct-mins (-n, value). Both
    * stages are partial-aggregating groupBys — no window, no sort.
    * Output: keyCols + `as`.
    */
  def modalValue(df: DataFrame, keyCols: Seq[String], valueCol: String,
                 as: String): DataFrame =
    df.where(col(valueCol).isNotNull)
      .groupBy((keyCols :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .groupBy(keyCols.map(col): _*)
      .agg(modalPick(col("__n"), col(valueCol)).as(as))

  /** Longest string wins; ties → smallest string. */
  def longest(value: Column): Column =
    max(when(value.isNotNull,
      struct(length(value).as("len"), value.as("v")))).getField("v")
}
