package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution drift between two datasets via the Population Stability
  * Index: bucket both sides on the same fixed-width grid, smooth the
  * bucket masses, and sum `(p - q) · ln(p / q)`. The distributional
  * escalation of the reference's scalar DQ gates
  * (sql/dq_rollup_check.sql) and the batch-over-batch health check a
  * training-data pipeline runs before accepting a new ingest: PSI < 0.1
  * is conventionally stable, > 0.25 a shifted population.
  *
  * Determinism: bucket counts are exact integers; masses use add-half
  * Laplace smoothing `(c + 0.5) / (n + B/2)` over the union bucket set
  * B (so empty-on-one-side buckets contribute finitely); the final sum
  * is rounded to 6 decimals, absorbing sub-ulp libm differences between
  * engines (same discipline as the token-entropy oracle).
  *
  * Scale shape: one bucket-grain aggregate per side (map-side partial),
  * a full-outer join on the bucket id (tiny — the grid), totals as a
  * 1-row broadcast; nothing driver-side.
  */
object Drift {

  /** Per-bucket exact counts of `value div bucketWidth` (integer `div`,
    * not double division — values past 2⁵³ would silently land in the
    * wrong bucket under a double round-trip).
    */
  def bucketCounts(df: DataFrame, value: Column, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth=$bucketWidth must be positive")
    df.select(value.cast("long").as("__v"))
      .select(expr(s"__v div ${bucketWidth}L").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("c"))
  }

  /** One row: `n_buckets` (union grid size), `n_a`, `n_b` (row counts),
    * `psi` (rounded to 6 decimals).
    */
  def psi(a: DataFrame, b: DataFrame, value: Column,
          bucketWidth: Long): DataFrame = {
    val ca = bucketCounts(a, value, bucketWidth).withColumnRenamed("c", "ca")
    val cb = bucketCounts(b, value, bucketWidth).withColumnRenamed("c", "cb")
    val grid = ca.join(cb, Seq("bucket"), "full_outer")
      .select(col("bucket"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val totals = grid.agg(count(lit(1)).as("n_buckets"),
      sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    val withTotals = grid.crossJoin(broadcast(totals))
    val p = (col("ca").cast("double") + 0.5) /
      (col("n_a").cast("double") + col("n_buckets").cast("double") / 2.0)
    val q = (col("cb").cast("double") + 0.5) /
      (col("n_b").cast("double") + col("n_buckets").cast("double") / 2.0)
    withTotals
      .select(col("n_buckets"), col("n_a"), col("n_b"),
        ((p - q) * log(p / q)).as("__contrib"))
      .groupBy(col("n_buckets"), col("n_a"), col("n_b"))
      .agg(round(sum(col("__contrib")), 6).as("psi"))
  }

  /** Two-sample Kolmogorov–Smirnov distance on the same bucket grid:
    * `D = max_x |F_a(x) - F_b(x)|` over the union of observed buckets —
    * the complementary drift statistic to [[psi]] (PSI weighs the whole
    * distribution, KS the single worst ECDF gap; a localized shift that
    * PSI's sum dilutes shows up undiluted here).
    *
    * Determinism: the ECDF comparison is EXACT INTEGER arithmetic —
    * `max |cum_a·n_b - cum_b·n_a|` carried INTERNALLY in decimal(38,0),
    * which cannot overflow (each factor ≤ 2⁶³ so the product
    * < 8.6e37 < 1e38); the single double division by `n_a·n_b` happens
    * once at the end, rounded to 6 decimals. No order-dependent double
    * sums — and no wide decimal in the OUTPUT schema: a decimal(38,0)
    * result column renders differently across engines/drivers (the r6
    * hash-mismatch class), so the exact integer never leaves this
    * method.
    *
    * Scale shape: one bucket-grain aggregate per side (map-side
    * partial), a full-outer join on the bucket id, then ONE cumulative
    * window over the grid. The window is single-partition BY DESIGN —
    * it runs on the bucket grid (size = value range / bucketWidth), not
    * the data, the same "tiny grid" discipline as [[psi]]; pick a
    * bucketWidth that keeps the grid in the thousands and the data
    * volume never touches the window.
    */
  def ks(a: DataFrame, b: DataFrame, value: Column,
         bucketWidth: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ca = bucketCounts(a, value, bucketWidth).withColumnRenamed("c", "ca")
    val cb = bucketCounts(b, value, bucketWidth).withColumnRenamed("c", "cb")
    val grid = ca.join(cb, Seq("bucket"), "full_outer")
      .select(col("bucket"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = grid.select(
      sum(col("ca")).over(w).as("cum_a"),
      sum(col("cb")).over(w).as("cum_b"))
    val totals = grid.agg(count(lit(1)).as("n_buckets"),
      sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    cum.crossJoin(broadcast(totals))
      .select(col("n_buckets"), col("n_a"), col("n_b"),
        abs(col("cum_a").cast("decimal(38,0)") * col("n_b") -
          col("cum_b").cast("decimal(38,0)") * col("n_a")).as("__gap"))
      .groupBy(col("n_buckets"), col("n_a"), col("n_b"))
      .agg(max(col("__gap")).cast("decimal(38,0)").as("__ks_scaled"))
      .select(col("n_buckets"), col("n_a"), col("n_b"),
        round(col("__ks_scaled").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")), 6)
          .as("ks"))
  }
}
