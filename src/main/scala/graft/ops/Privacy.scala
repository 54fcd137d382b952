package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity auditing over quasi-identifier columns — the privacy
  * gate a training-data release runs AFTER PII scrubbing
  * ([[graft.llm.Curation]] removes direct identifiers; this measures
  * re-identification risk from the indirect ones): a row is k-anonymous
  * when at least k−1 other rows share its full quasi-identifier
  * combination, so any group smaller than k is a linkage-attack
  * candidate (Sweeney 2002).
  *
  * Scale shape: ONE aggregate at quasi-identifier grain (the same
  * shuffle any rollup pays), then group-grain filters/summaries — rows
  * never re-shuffle, nothing collects. The violation report is bounded
  * by the number of SMALL groups, which is what makes it reviewable.
  */
object Privacy {

  /** Quasi-identifier groups with fewer than `k` rows, largest risk
    * (smallest group) first. Null is a VALUE here: an all-null combo is
    * its own group, because "the row with everything redacted" is still
    * linkable if it is unique.
    */
  def kAnonymityViolations(df: DataFrame, quasiCols: Seq[String],
                           k: Long): DataFrame = {
    require(k >= 2, s"k=$k (k-anonymity needs k >= 2)")
    require(quasiCols.nonEmpty, "no quasi-identifier columns")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .where(col("n_rows") < k)
  }

  /** One-row audit summary: group/row totals, violating groups, rows
    * at risk, and `k_effective` (the smallest group size — the k the
    * dataset ACTUALLY provides; release gates compare it to policy).
    */
  def kAnonymityStats(df: DataFrame, quasiCols: Seq[String],
                      k: Long): DataFrame = {
    require(k >= 2, s"k=$k (k-anonymity needs k >= 2)")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .agg(count(lit(1)).as("n_groups"),
        sum(col("n_rows")).as("n_total_rows"),
        sum(when(col("n_rows") < k, 1L).otherwise(0L))
          .as("n_violating_groups"),
        sum(when(col("n_rows") < k, col("n_rows")).otherwise(0L))
          .as("n_rows_at_risk"),
        min(col("n_rows")).as("k_effective"))
  }
}
