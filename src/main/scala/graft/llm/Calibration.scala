package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Closed-form linear-probe fitting over integer features — the
  * aggregate-only form of model training a data pipeline can afford at
  * corpus scale: ONE map-side pass accumulates the normal-equation
  * moments (all cross-products summed EXACTLY in decimal(38,0) — no
  * order-dependent floating-point accumulation, so the fit is
  * bit-reproducible and engine-twinnable), then Cramer's rule solves
  * the 3×3 system in a fixed-shape double expression.
  *
  * The motivating instance: estimate subword token counts from cheap
  * byte statistics ("how many tokens is this corpus?" without running
  * a tokenizer over 100 TB). Features stay INTEGER columns (counts,
  * byte lengths, fixed-point ratios) — that is what makes the moments
  * exact; the only floating-point arithmetic is the final closed-form
  * solve, identical on any IEEE engine evaluating the same expression
  * tree.
  *
  * Scale shape: the moment aggregate is a full-pushdown partial (nine
  * sums and a count), output is ONE row; nothing shuffles but 10
  * numbers per partition. Training is literally as expensive as a
  * `count(*)`.
  */
object Calibration {

  private def d38(c: Column): Column = graft.ops.Exact.d38(c)

  /** OLS fit `y ≈ b0 + b1·x1 + b2·x2` via the normal equations.
    * Inputs MUST be integer-valued columns (long-castable); moments
    * accumulate exactly. Output: one row
    * `(n, b0, b1, b2, r2)` with coefficients rounded to 6 decimals.
    *
    * Degenerate designs (collinear features, n < 3) yield a zero
    * determinant: the row reports null coefficients rather than a
    * division blow-up — callers gate on `b0 IS NOT NULL`.
    */
  def olsFit2(df: DataFrame, x1: Column, x2: Column, y: Column): DataFrame = {
    val m = df.select(x1.cast("long").as("x1"), x2.cast("long").as("x2"),
        y.cast("long").as("y"))
      .agg(
        count(lit(1)).as("n"),
        sum(d38(col("x1"))).as("s1"), sum(d38(col("x2"))).as("s2"),
        sum(d38(col("y"))).as("sy"),
        sum(d38(col("x1")) * d38(col("x1"))).as("s11"),
        sum(d38(col("x1")) * d38(col("x2"))).as("s12"),
        sum(d38(col("x2")) * d38(col("x2"))).as("s22"),
        sum(d38(col("x1")) * d38(col("y"))).as("s1y"),
        sum(d38(col("x2")) * d38(col("y"))).as("s2y"),
        sum(d38(col("y")) * d38(col("y"))).as("syy"))
    // fixed-shape doubles from the exact moments; the same expression
    // tree is written in the DuckDB twin, so every intermediate rounds
    // identically (IEEE ops on identical inputs)
    val n = col("n").cast("double")
    def dd(c: String) = col(c).cast("double")
    // Cramer on the 3x3 normal matrix [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]]
    val det = n * (dd("s11") * dd("s22") - dd("s12") * dd("s12")) -
      dd("s1") * (dd("s1") * dd("s22") - dd("s12") * dd("s2")) +
      dd("s2") * (dd("s1") * dd("s12") - dd("s11") * dd("s2"))
    val det0 = dd("sy") * (dd("s11") * dd("s22") - dd("s12") * dd("s12")) -
      dd("s1") * (dd("s1y") * dd("s22") - dd("s12") * dd("s2y")) +
      dd("s2") * (dd("s1y") * dd("s12") - dd("s11") * dd("s2y"))
    val det1 = n * (dd("s1y") * dd("s22") - dd("s12") * dd("s2y")) -
      dd("sy") * (dd("s1") * dd("s22") - dd("s12") * dd("s2")) +
      dd("s2") * (dd("s1") * dd("s2y") - dd("s1y") * dd("s2"))
    val det2 = n * (dd("s11") * dd("s2y") - dd("s1y") * dd("s12")) -
      dd("s1") * (dd("s1") * dd("s2y") - dd("s1y") * dd("s2")) +
      dd("sy") * (dd("s1") * dd("s12") - dd("s11") * dd("s2"))
    val b0 = det0 / det
    val b1 = det1 / det
    val b2 = det2 / det
    // R² from the same moments: 1 − SSE/SST, SSE expanded in moments
    val sse = dd("syy") - b0 * dd("sy") - b1 * dd("s1y") - b2 * dd("s2y")
    val sst = dd("syy") - dd("sy") * dd("sy") / n
    m.select(col("n"),
      when(det =!= 0.0, round(b0, 6)).as("b0"),
      when(det =!= 0.0, round(b1, 6)).as("b1"),
      when(det =!= 0.0, round(b2, 6)).as("b2"),
      when(det =!= 0.0 && sst =!= 0.0, round(lit(1.0) - sse / sst, 6))
        .as("r2"))
  }
}
