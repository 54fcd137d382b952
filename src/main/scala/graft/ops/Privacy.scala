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

  /** l-diversity audit (Machanavajjhala 2007) — k-anonymity's blind
    * spot: a group of 50 identical quasi-identifier rows is 50-anonymous
    * yet leaks everything if all 50 share one sensitive value. One-row
    * summary at quasi-identifier grain: groups whose DISTINCT sensitive
    * values number fewer than `l`, the rows they expose, and
    * `l_effective` (the diversity the dataset actually provides).
    *
    * Scale shape: the distinct count nests inside the one
    * quasi-identifier aggregate (two-phase distinct, partial-pushed) —
    * the same single shuffle as [[kAnonymityStats]].
    */
  def lDiversityStats(df: DataFrame, quasiCols: Seq[String],
                      sensitiveCol: String, l: Long): DataFrame = {
    require(l >= 2, s"l=$l (l-diversity needs l >= 2)")
    require(quasiCols.nonEmpty, "no quasi-identifier columns")
    require(!quasiCols.contains(sensitiveCol),
      s"sensitive column '$sensitiveCol' cannot also be a quasi-identifier")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(col(sensitiveCol)).as("n_distinct"))
      .agg(count(lit(1)).as("n_groups"),
        sum(col("n_rows")).as("n_total_rows"),
        sum(when(col("n_distinct") < l, 1L).otherwise(0L))
          .as("n_violating_groups"),
        sum(when(col("n_distinct") < l, col("n_rows")).otherwise(0L))
          .as("n_rows_at_risk"),
        min(col("n_distinct")).as("l_effective"))
  }

  /** Per-group counts with SEEDED Laplace noise — the differential-
    * privacy release mechanism in its reproducible-pipeline form: noise
    * is drawn from the inverse Laplace CDF at a uniform derived from a
    * 60-bit md5 of (group key, seed), so reruns and engine twins produce
    * bit-identical releases (a pipeline that re-publishes different
    * noise for the same release window leaks by averaging). A count
    * query has sensitivity 1, so scale = 1/ε gives ε-DP per release
    * AGAINST THE SEED being fresh per release: rotate `seed` per
    * release window, never per query, and budget ε across windows.
    *
    * Scale shape: one keyed aggregate; the noise is a column expression
    * over the group key — map-side, no second pass, nothing collects.
    * The one engine-variant operation (`ln`) is absorbed by the repo's
    * 6-decimal rounding discipline.
    */
  def dpNoisyCounts(df: DataFrame, keys: Seq[String], epsilon: Double,
                    seed: Long): DataFrame = {
    require(epsilon > 0, s"epsilon=$epsilon must be positive")
    require(keys.nonEmpty, "no group keys")
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
    val keyStr = concat_ws("\u0001",
      keys.map(c => coalesce(col(c).cast("string"), lit("\u0000null"))) :+
        lit(seed.toString): _*)
    val u = Fingerprint.hash60(keyStr).cast("double") / lit(math.pow(2, 60))
    val centered = u - lit(0.5)
    // inverse Laplace CDF; the 1e-18 floor guards the measure-zero
    // u → 0 edge (ln 0) identically on both engines
    val noise = -signum(centered) *
      log(greatest(lit(1e-18), lit(1.0) - lit(2.0) * abs(centered))) /
      lit(epsilon)
    counts.select(keys.map(col) :+
      round(col("n").cast("double") + noise, 6).as("noisy_count"): _*)
  }
}
