package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inferential statistics over exact integer inputs — the DQ
  * escalation beyond thresholds ([[Anomaly]]) and drift scores
  * ([[Drift]]): is this association real?
  *
  * Determinism discipline (same as [[Trend]]): every aggregate is an
  * exact long moment; doubles appear only in the final closed-form
  * arithmetic, whose operation order is fixed in the plan — so results
  * are bit-reproducible across engines and partitionings, and a
  * 6-decimal rounding makes them hash-comparable.
  */
object Stats {

  /** `groupCols + n + corr`: Pearson correlation of `x` and `y` per
    * group from the six exact integer moments; null when either
    * variance is zero (the SQL convention). Incomplete pairs (null x
    * or y) are excluded — the same pairwise deletion Spark's `corr`
    * applies. Same overflow envelope as [[Trend.linearTrend]] — rebase
    * large x/y to the group origin.
    */
  def pearson(df: DataFrame, groupCols: Seq[String], x: Column,
              y: Column): DataFrame = {
    val moments = Moments.of(df, groupCols, x, y, withYY = true)
    val cov = (col("n") * col("__sxy") - col("__sx") * col("__sy")).cast("double")
    val vx = (col("n") * col("__sxx") - col("__sx") * col("__sx")).cast("double")
    val vy = (col("n") * col("__syy") - col("__sy") * col("__sy")).cast("double")
    moments
      .withColumn("corr",
        when(vx > 0 && vy > 0, cov / sqrt(vx * vy)))
      .drop("__sx", "__sy", "__sxy", "__sxx", "__syy")
  }

  /** Spearman rank correlation, EXACT and engine-twinnable — the
    * robust complement of [[pearson]]: monotone association that
    * outliers and nonlinearity can't distort (a handful of mispriced
    * rows that wreck Pearson barely move rank order).
    *
    * No row-grain sort: average ranks come from the VALUE GRID
    * (counts per distinct value + a cumulative window over the grid,
    * the [[Eval.aucMannWhitney]] shape), doubled so ties' half-ranks
    * stay integer (`2·avgRank = 2·countBelow + n_eq + 1`). Rows join
    * their doubled ranks back by value (keyed), the five moments
    * accumulate exactly in decimal(38,0), and ρ is one closed-form
    * double expression. Grid size is bounded by distinct values, not
    * rows. One row out: `(n, rho)`; null ρ when either side is
    * constant.
    */
  def spearman(df: DataFrame, x: Column, y: Column): DataFrame = {
    import Exact.d38
    // the 2-long projection feeds both grid builds AND the rank
    // join-back — checkpointed so the source scans once instead of
    // three times (r13; guide §5 caching-when-reused; size-adaptive
    // storage like the fact-table checkpoints)
    val base = graft.Memos.adaptiveCheckpoint(
      df.select(x.cast("long").as("__x"), y.cast("long").as("__y"))
        .where(col("__x").isNotNull && col("__y").isNotNull))
    def ranks2(c: String): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window.orderBy(col(c))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      base.groupBy(col(c)).agg(count(lit(1)).as("__n"))
        .select(col(c),
          (coalesce(sum(col("__n")).over(w), lit(0L)) * 2 +
            col("__n") + 1).as(s"__r2$c"))
    }
    val ranked = base.join(ranks2("__x"), "__x").join(ranks2("__y"), "__y")
    val m = ranked.agg(count(lit(1)).as("n"),
      sum(d38(col("__r2__x"))).as("sa"), sum(d38(col("__r2__y"))).as("sb"),
      sum(d38(col("__r2__x")) * d38(col("__r2__y"))).as("sab"),
      sum(d38(col("__r2__x")) * d38(col("__r2__x"))).as("saa"),
      sum(d38(col("__r2__y")) * d38(col("__r2__y"))).as("sbb"))
    val n = col("n").cast("double")
    def dd(c: String) = col(c).cast("double")
    val cov = n * dd("sab") - dd("sa") * dd("sb")
    val vx = n * dd("saa") - dd("sa") * dd("sa")
    val vy = n * dd("sbb") - dd("sb") * dd("sb")
    m.select(col("n"),
      when(vx > 0 && vy > 0, round(cov / sqrt(vx * vy), 6)).as("rho"))
  }

  /** Benford first-digit audit — the forensic-accounting DQ screen
    * (Nigrini 2012): naturally occurring multi-magnitude amounts have
    * first-digit frequencies `log10(1 + 1/d)`; fabricated, capped, or
    * unit-converted data drifts off that curve. One row per digit 1-9:
    * observed count, observed share, the Benford expectation, and the
    * signed gap — plus each digit's contribution to the mean absolute
    * deviation (Nigrini's conformity statistic: MAD < 0.006 ≈ close
    * conformity; > 0.015 ≈ nonconformity; sum `mad_term` to read it).
    *
    * `value` must be integer-grain and positive to participate (zeros,
    * nulls, negatives are excluded — they have no Benford first digit).
    *
    * Scale shape: first digit is a map-side string expression; the
    * aggregate has ≤ 9 groups; the totals join is a 1-row broadcast.
    */
  def benfordFirstDigit(df: DataFrame, value: Column): DataFrame = {
    val digits = df.select(value.cast("long").as("__v"))
      .where(col("__v").isNotNull && col("__v") > 0L)
      .select(substring(col("__v").cast("string"), 1, 1).cast("int")
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val total = digits.agg(sum(col("n_obs")).as("__n_total"))
    val obsShare = col("n_obs").cast("double") / col("__n_total").cast("double")
    // log10(1 + 1/d) via ln — the same closed form in the twin
    val expShare = log(lit(1.0) + lit(1.0) / col("digit").cast("double")) /
      log(lit(10.0))
    digits.crossJoin(broadcast(total))
      .select(col("digit"), col("n_obs"),
        round(obsShare, 6).as("obs_share"),
        round(expShare, 6).as("benford_share"),
        round(obsShare - expShare, 6).as("gap"),
        round(abs(obsShare - expShare) / lit(9.0), 6).as("mad_term"))
      .orderBy(col("digit"))
  }

  /** One row `(n, dof, chi2)`: Pearson's chi-square statistic for
    * independence of two categorical columns. Rows with a null category
    * on either side are EXCLUDED up front (they would silently drop
    * from the marginal joins while inflating `n`). Observed and
    * marginal counts are exact longs; each cell's `(obs − exp)² / exp`
    * term is closed-form double arithmetic; zero-marginal cells cannot
    * occur (cells come from observed pairs). `dof = (r−1)(c−1)`. The
    * final cell-sum is a double accumulation over the (tiny) grid, so
    * the 6-decimal rounding is what makes it hash-comparable — same
    * residual as [[Drift.psi]], not bit-order-invariance.
    */
  def chiSquare(df: DataFrame, a: Column, b: Column): DataFrame = {
    val cells = df.select(a.as("__a"), b.as("__b"))
      .where(col("__a").isNotNull && col("__b").isNotNull)
      .groupBy(col("__a"), col("__b")).agg(count(lit(1)).as("obs"))
    val rowT = cells.groupBy(col("__a")).agg(sum(col("obs")).as("row_t"))
    val colT = cells.groupBy(col("__b")).agg(sum(col("obs")).as("col_t"))
    val totals = cells.agg(sum(col("obs")).as("n"),
      count_distinct(col("__a")).as("r"), count_distinct(col("__b")).as("c"))
    val exp = col("row_t").cast("double") * col("col_t").cast("double") /
      col("n").cast("double")
    cells
      .join(rowT, "__a").join(colT, "__b")
      .crossJoin(broadcast(totals))
      .select(col("n"), ((col("r") - 1) * (col("c") - 1)).as("dof"),
        ((col("obs").cast("double") - exp) * (col("obs").cast("double") - exp)
          / exp).as("__term"))
      .groupBy(col("n"), col("dof"))
      .agg(round(sum(col("__term")), 6).as("chi2"))
  }

  /** Per-group Gini coefficient of an integer (cents) measure — the
    * concentration number behind "the top customers are 80% of
    * revenue": 0 = perfectly even, →1 = one member holds everything.
    * Computed from the sorted-rank identity
    * {{{ G = 2·Σ i·x_(i) / (n·Σx) − (n+1)/n }}}
    * with ranks from a per-GROUP window (group sizes are the bound,
    * never the table) and Σ i·x as an exact long — tied values make
    * the rank order ambiguous but leave Σ i·x invariant (a tied block
    * contributes its fixed position-sum × the common value), so the
    * result is deterministic without a tiebreak. One rounded division
    * at the end; zero-total groups null.
    *
    * Overflow envelope: `rank·x` sums must fit int64 — cent-scale
    * members up to ~10⁵ rows per group; pre-scale past that.
    */
  def gini(df: DataFrame, groupCol: String, centsCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__x").asc)
    df.select(col(groupCol), col(centsCol).cast("long").as("__x"))
      .withColumn("__i", row_number().over(w).cast("long"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("total_cents"),
        sum(col("__i") * col("__x")).as("__t"))
      .select(col(groupCol), col("n"), col("total_cents"),
        when(col("total_cents") > 0L,
          round(lit(2.0) * col("__t").cast("double") /
            (col("n").cast("double") * col("total_cents").cast("double")) -
            (col("n") + 1L).cast("double") / col("n").cast("double"), 6))
          .as("gini"))
  }

  /** Two-proportion z-test — the A/B experiment readout: did variant A
    * convert at a different rate than variant B, and by how many
    * pooled standard errors. One aggregation pass collects the four
    * exact counts; every derived number (rates, pooled rate, z) is a
    * closed-form double over those exact longs — identical on any
    * engine, rounded at 6 decimals. Degenerate pools (all-success,
    * all-failure, an empty arm) yield null z.
    *
    * Degenerate-input contract: rows with a NULL outcome are EXCLUDED
    * entirely (they must not inflate an arm's n while never counting as
    * a conversion); rows with a NULL variant flag belong to neither arm
    * and are likewise excluded; an empty (or fully-excluded) input
    * returns one row of ZERO counts and null rates/z, not NULL counts.
    *
    * @param variantA boolean: row belongs to arm A
    * @param success boolean outcome
    * @return one row: (n_a, conv_a, n_b, conv_b, rate_a, rate_b, z)
    */
  def twoProportionZ(df: DataFrame, variantA: Column,
                     success: Column): DataFrame = {
    val agg = df.where(variantA.isNotNull && success.isNotNull).agg(
      coalesce(sum(when(variantA, 1L).otherwise(0L)), lit(0L)).as("n_a"),
      coalesce(sum(when(variantA && success, 1L).otherwise(0L)), lit(0L))
        .as("conv_a"),
      coalesce(sum(when(!variantA, 1L).otherwise(0L)), lit(0L)).as("n_b"),
      coalesce(sum(when(!variantA && success, 1L).otherwise(0L)), lit(0L))
        .as("conv_b"))
    def dd(c: String) = col(c).cast("double")
    val p1 = dd("conv_a") / dd("n_a")
    val p2 = dd("conv_b") / dd("n_b")
    val pool = (dd("conv_a") + dd("conv_b")) / (dd("n_a") + dd("n_b"))
    val se = sqrt(pool * (lit(1.0) - pool) *
      (lit(1.0) / dd("n_a") + lit(1.0) / dd("n_b")))
    agg.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      when(col("n_a") > 0L, round(p1, 6)).as("rate_a"),
      when(col("n_b") > 0L, round(p2, 6)).as("rate_b"),
      when(col("n_a") > 0L && col("n_b") > 0L &&
        col("conv_a") + col("conv_b") > 0L &&
        col("conv_a") + col("conv_b") < col("n_a") + col("n_b"),
        round((p1 - p2) / se, 6)).as("z"))
  }
}
