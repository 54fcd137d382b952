package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group least-squares trend (slope + intercept) over an integer
  * time axis — "is this supplier's revenue rising?" asked of every
  * group at once. Instead of `regr_slope`'s running double sums (whose
  * accumulation order differs per engine and partitioning), the five
  * moments Σx, Σy, Σxy, Σx², n aggregate as EXACT integers and the
  * slope is ONE double division at the end:
  *
  *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
  *
  * so results are bit-reproducible across engines, partitionings, and
  * reruns — the same determinism discipline as the integer-cents
  * median/MAD ops ([[Anomaly]]).
  *
  * Overflow envelope: the numerator terms are `n · Σ(x·y)`; with x an
  * epoch-month index (≲ 10³ after [[GapFill.monthIndex]]) and y in
  * cents, a group stays inside long range up to roughly 10¹⁵ total
  * cent-months — callers with larger groups should rebase x to the
  * group's own origin (x − min x), which also conditions the
  * denominator. Rebasing changes the intercept's meaning (origin =
  * group start), not the slope.
  *
  * Scale shape: one group-grain partial-aggregated shuffle carrying
  * five longs per group; the division is map-only on the tiny result.
  */
object Trend {

  /** Classical ratio-to-moving-average seasonal decomposition (the
    * textbook X-11 ancestor) over an even-period series: per period
    * slot (e.g. month-of-year), the average ratio of the observed value
    * to its CENTERED period-length moving average. An index of 1.12 for
    * December reads "Decembers run 12% above trend" — the
    * deseasonalizing divisor a forecast or anomaly gate applies before
    * comparing months.
    *
    * `df` must hold ONE row per consecutive integer `tickCol` (gap-fill
    * first — a missing month silently shifts every window after it) with
    * an exact integer `valueCol`. For even `period` p the centered MA at
    * t is the standard two-window average
    * `(Σ[t-p/2, t+p/2-1] + Σ[t-p/2+1, t+p/2]) / 2p`, defined only where
    * both windows are complete — edge ticks drop out of the ratio pool
    * rather than biasing it.
    *
    * Output per slot `tick % period`: `slot, n_obs, seasonal_index`
    * (mean ratio, 6-decimal). The window sums are exact longs; each
    * ratio is one double division rounded to a fixed 9-decimal grid;
    * the per-slot mean is then a double sum over a handful of grid
    * values — the [[Stats.chiSquare]] tiny-grid residual, absorbed by
    * the final 6-decimal rounding.
    *
    * Scale shape: one unpartitioned ordered window over the SERIES
    * (period-grain input, e.g. months — thousands of rows at most, not
    * data grain; for per-group series add the group key to the window
    * spec), then a slot-grain aggregate.
    */
  def seasonalIndices(df: DataFrame, tickCol: String, valueCol: String,
                      period: Int): DataFrame = {
    require(period >= 2 && period % 2 == 0, s"period=$period must be even >= 2")
    val h = period / 2
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(tickCol))
    val v = col(valueCol).cast("long")
    val sumA = sum(v).over(w.rowsBetween(-h, h - 1))
    val cntA = count(v).over(w.rowsBetween(-h, h - 1))
    val sumB = sum(v).over(w.rowsBetween(-h + 1, h))
    val cntB = count(v).over(w.rowsBetween(-h + 1, h))
    val trend = (sumA + sumB).cast("double") / lit(2.0 * period)
    val ratio = when(cntA === period && cntB === period && trend =!= 0.0,
      round(v.cast("double") / trend, 9))
    df.select(pmod(col(tickCol).cast("long"), lit(period.toLong)).as("slot"),
        ratio.as("__r"))
      .where(col("__r").isNotNull)
      .groupBy(col("slot"))
      .agg(count(lit(1)).as("n_obs"),
        round(sum(col("__r")) / count(lit(1)).cast("double"), 6)
          .as("seasonal_index"))
      .orderBy(col("slot"))
  }

  /** `groupCols + n + slope + intercept`: least-squares fit of `y`
    * against `x` per group. Groups with fewer than 2 distinct x values
    * have an undefined slope → null slope/intercept (the SQL
    * convention), never a divide-by-zero.
    */
  /** Per-lag autocorrelation of an integer-valued series — "does order
    * volume today predict volume k days out?" for every lag 1..`maxLag`
    * at once. For lag k this is the exact Pearson correlation over the
    * aligned pairs (v[t], v[t+k]) (the regression form of the sample
    * ACF; it differs from the global-mean textbook estimator only in
    * using each lag's own pair means, which is what makes it exact on a
    * gappy series too).
    *
    * `df` must be at (tick, value) grain with integer ticks and an
    * exact integer `valueCol` — aggregate + gap-fill first if the
    * source is event-grain. Missing ticks simply contribute no pair at
    * the lags they'd span (pairwise deletion), they do not shift the
    * alignment.
    *
    * Determinism: all five moments per lag aggregate as exact longs;
    * each r_k is one double expression at the end, rounded to 6
    * decimals — bit-stable across engines and partitionings, the same
    * discipline as [[linearTrend]]. Overflow envelope: Σ(v·v) per lag
    * must stay below 2⁶³ — at 10⁹ ticks that allows values to ~3000,
    * beyond which callers should rescale the series first.
    *
    * Scale shape: the lag explosion multiplies the SERIES (tick grain,
    * not data grain) by `maxLag`, then one equi-join on the shifted
    * tick and one lag-grain aggregate — never a window over the whole
    * series, never a driver loop over lags.
    */
  def acf(df: DataFrame, tickCol: String, valueCol: String,
          maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag=$maxLag")
    val base = df.select(col(tickCol).cast("long").as("__t"),
      col(valueCol).cast("long").as("__v"))
    val a = base.withColumn("lag", explode(sequence(lit(1), lit(maxLag))))
      .withColumn("lag", col("lag").cast("int"))
    val b = base.select(col("__t").as("__tb"), col("__v").as("__vb"))
    val num = (col("n_pairs") * col("__sxy") - col("__sx") * col("__sy"))
      .cast("double")
    val denX = (col("n_pairs") * col("__sxx") - col("__sx") * col("__sx"))
      .cast("double")
    val denY = (col("n_pairs") * col("__syy") - col("__sy") * col("__sy"))
      .cast("double")
    a.join(b, a("__t") + a("lag") === b("__tb"))
      .groupBy(col("lag"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(col("__v")).as("__sx"), sum(col("__vb")).as("__sy"),
        sum(col("__v") * col("__vb")).as("__sxy"),
        sum(col("__v") * col("__v")).as("__sxx"),
        sum(col("__vb") * col("__vb")).as("__syy"))
      .withColumn("r",
        when(denX > 0d && denY > 0d,
          round(num / sqrt(denX * denY), 6)))
      .select(col("lag"), col("n_pairs"), col("r"))
      .orderBy(col("lag"))
  }

  def linearTrend(df: DataFrame, groupCols: Seq[String], x: Column,
                  y: Column): DataFrame = {
    // shared moment scaffolding (pairwise deletion of null x/y)
    val moments = Moments.of(df, groupCols, x, y, withYY = false)
    val den = col("n") * col("__sxx") - col("__sx") * col("__sx")
    val slope = when(den =!= 0L,
      (col("n") * col("__sxy") - col("__sx") * col("__sy")).cast("double")
        / den.cast("double"))
    val intercept = when(den =!= 0L,
      (col("__sy").cast("double") - col("slope") * col("__sx").cast("double"))
        / col("n").cast("double"))
    moments
      .withColumn("slope", slope)
      .withColumn("intercept", intercept)
      .drop("__sx", "__sy", "__sxy", "__sxx")
  }

  /** Holt double-exponential smoothing (level + trend) per key, in
    * FIXED-POINT integer arithmetic: with α = aNum/aDen,
    * β = bNum/bDen and y in integer cents,
    * {{{
    *   s_t = (aNum·y_t + (aDen−aNum)·(s_{t−1} + b_{t−1})) fdiv aDen
    *   b_t = (bNum·(s_t − s_{t−1}) + (bDen−bNum)·b_{t−1}) fdiv bDen
    * }}}
    * initialized s₁ = y₁, b₁ = 0 — every step one floor division
    * (`fdiv` is the portable pmod form, [[Pca.floorDivQ]]; the trend
    * term goes NEGATIVE on declining series, where a bare `div`
    * truncates toward zero and diverges from an engine that floors).
    * Bit-identical on any engine; [[holtSql]] is the recursive-CTE
    * twin.
    *
    * The recursion is inherently sequential IN TIME, so it runs as a
    * per-key fold over the collected series (`collect_list` →
    * `array_sort` → `aggregate`) — one shuffle at key grain, each
    * key's series folded in order on one executor. That is the correct
    * scale shape: series length is bounded (months, days), key count
    * is what grows, and keys parallelize perfectly. Never a global
    * window.
    *
    * @param df one row per (key, tick); ticks need not be consecutive
    *        (the recursion consumes observations in tick order)
    * @return (keyCol, n_points, level, trend, forecast_next =
    *         level + trend) — the final smoothed state per key
    */
  def holtLinear(df: DataFrame, keyCol: String, tickCol: String,
                 centsCol: String, aNum: Long = 3L, aDen: Long = 10L,
                 bNum: Long = 2L, bDen: Long = 10L): DataFrame = {
    require(aNum > 0 && aNum <= aDen, s"alpha $aNum/$aDen")
    require(bNum > 0 && bNum <= bDen, s"beta $bNum/$bDen")
    def fdiv(a: Column, b: Column): Column =
      ((a - pmod(a, b)) / b).cast("long")
    val series = array_sort(collect_list(
      struct(col(tickCol).cast("long").as("t"),
        col(centsCol).cast("long").as("y"))))
    val grouped = df.groupBy(col(keyCol)).agg(series.as("__series"))
    val rest = expr(
      "slice(__series, 2, greatest(size(__series) - 1, 0))")
    val init = struct(
      element_at(col("__series"), 1).getField("y").as("s"),
      lit(0L).as("b"))
    val folded = aggregate(rest, init, (acc, x) => {
      val sPrev = acc.getField("s")
      val bPrev = acc.getField("b")
      val sNew = fdiv(lit(aNum) * x.getField("y") +
        lit(aDen - aNum) * (sPrev + bPrev), lit(aDen))
      val bNew = fdiv(lit(bNum) * (sNew - sPrev) +
        lit(bDen - bNum) * bPrev, lit(bDen))
      struct(sNew.as("s"), bNew.as("b"))
    })
    grouped
      .withColumn("__st", folded)
      .select(col(keyCol), size(col("__series")).cast("long").as("n_points"),
        col("__st.s").as("level"), col("__st.b").as("trend"),
        (col("__st.s") + col("__st.b")).as("forecast_next"))
  }

  /** ANSI-SQL twin of [[holtLinear]] (recursive CTE, one row per
    * smoothing step); `srcSql` must yield (key, t, y). Keep in
    * lockstep.
    */
  def holtSql(srcSql: String, aNum: Long = 3L, aDen: Long = 10L,
              bNum: Long = 2L, bDen: Long = 10L): String = {
    // portable FLOOR division (a bare `//` truncates toward zero on
    // negatives in some engines — the declining-series trap)
    def fdiv(a: String, b: String) =
      s"CAST((($a) - ((($a) % ($b) + ($b)) % ($b))) / ($b) AS BIGINT)"
    val sNew = fdiv(s"$aNum * m.y + ${aDen - aNum} * (rec.s + rec.b)",
      aDen.toString)
    val bNew = fdiv(s"$bNum * (($sNew) - rec.s) + ${bDen - bNum} * rec.b",
      bDen.toString)
    s"""WITH RECURSIVE src AS ($srcSql),
       |m AS (
       |  SELECT key, y,
       |         row_number() OVER (PARTITION BY key ORDER BY t) AS rn
       |  FROM src
       |),
       |rec AS (
       |  SELECT key, 1 AS t, y AS s, CAST(0 AS BIGINT) AS b
       |  FROM m WHERE rn = 1
       |  UNION ALL
       |  SELECT m.key, rec.t + 1, $sNew, $bNew
       |  FROM rec JOIN m ON m.key = rec.key AND m.rn = rec.t + 1
       |),
       |last AS (
       |  SELECT key, t, s, b,
       |         row_number() OVER (PARTITION BY key ORDER BY t DESC) AS rn
       |  FROM rec
       |)
       |SELECT key, CAST(t AS BIGINT) AS n_points,
       |       CAST(s AS BIGINT) AS level, CAST(b AS BIGINT) AS trend,
       |       CAST(s + b AS BIGINT) AS forecast_next
       |FROM last WHERE rn = 1 ORDER BY key""".stripMargin
  }
}
