package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function surface.
  *
  * The reference itself uses no window functions (SURVEY.md §2.5 W1) —
  * this is the deterministic upgrade path it implies: `first(ignoreNulls)`
  * pick-one semantics become `row_number` over an explicit order, plus
  * the running-total / sessionization shapes any monthly-production
  * analytics layer ends up needing. All single-shuffle on the partition
  * key.
  */
object Windows {

  /** One row per key: the first row under `order` (deterministic when
    * `order` is total). The deterministic form of A1's pick-one.
    */
  def latestPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Running total of `measure` per key under `order`. */
  def runningTotal(df: DataFrame, keys: Seq[String], order: Seq[Column],
                   measure: Column, as: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(as, sum(measure).over(w))
  }

  /** Cumulative-distinct ("reach") curve: per tick, how many distinct
    * keys were active that tick, how many appeared for the FIRST time,
    * and the running total of distinct keys ever seen. The naive
    * formulation (count distinct over an expanding window) rescans the
    * whole history per tick; this is the scalable identity: a key
    * contributes to the cumulative count exactly once, at its min-tick,
    * so `n_cum(t) = Σ_{u ≤ t} n_new(u)` — one key-grain aggregate, one
    * tick-grain aggregate, one running sum over the TICK SERIES
    * (thousands of rows, not data grain — same series-grain caveat as
    * [[graft.ops.Trend.seasonalIndices]]).
    */
  def cumulativeDistinct(df: DataFrame, keyCol: String,
                         tickCol: String): DataFrame = {
    val active = df.groupBy(col(tickCol).as("tick"))
      .agg(count_distinct(col(keyCol)).as("n_active"))
    val newPerTick = df.groupBy(col(keyCol))
      .agg(min(col(tickCol)).as("tick"))
      .groupBy(col("tick"))
      .agg(count(lit(1)).as("n_new"))
    val w = Window.orderBy(col("tick"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    active.join(newPerTick, Seq("tick"), "left")
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
      .withColumn("n_cum", sum(col("n_new")).over(w))
      .orderBy(col("tick"))
  }

  /** Exact rolling median of an integer measure over the trailing
    * `nRows`-row frame per key — the robust counterpart of a trailing
    * mean: one outlier day saturates a 7-day average but barely moves
    * the 7-day median. Exactness: `percentile` (the exact-percentile
    * aggregate, not `approx_percentile`) over integer inputs yields
    * only x.0 / x.5 values — bit-stable across engines, no
    * interpolation ambiguity. Same single-shuffle partitioned-window
    * shape as [[runningTotal]]; the frame buffer holds `nRows` longs
    * per position, independent of group size.
    */
  def rollingMedian(df: DataFrame, keys: Seq[String], order: Seq[Column],
                    measure: Column, nRows: Int, as: String): DataFrame = {
    require(nRows >= 1, s"nRows=$nRows")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(-(nRows - 1), Window.currentRow)
    df.withColumn(as, percentile(measure, lit(0.5)).over(w).cast("double"))
  }

  /** Gap-based sessionization: a new session starts when the time since
    * the previous event (per key, under `order`) exceeds `gapSeconds`.
    * Adds a 1-based `session_id` per key.
    */
  def sessionize(df: DataFrame, key: String, ts: String,
                 order: Seq[Column], gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(order: _*)
    val gap = unix_timestamp(col(ts)) - unix_timestamp(lag(col(ts), 1).over(w))
    val isNew = when(gap.isNull || gap > gapSeconds, 1L).otherwise(0L)
    df.withColumn("session_id",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Time-weighted average over an IRREGULARLY sampled series — the
    * metrics-engine `time_weight('LOCF')` semantics: each sample's
    * value holds until the next sample, so the mean weights each value
    * by its holding duration instead of pretending samples are
    * equally spaced (a sensor that reports 1/s while broken and 1/h
    * while healthy would otherwise average mostly-broken). The last
    * sample has no successor and contributes no area (pure LOCF
    * integral over the observed span).
    *
    * Per key: `n_samples, span_us, twa` (6-decimal; null for keys with
    * fewer than two samples — no span to integrate). `value` must be
    * integer-grain (e.g. cents): each value·duration term is then
    * exact, the per-key sums accumulate exactly in decimal(38,0), and
    * the single closed-form division makes the result engine-twinnable.
    *
    * Scale shape: one per-key ordered window for the successor
    * timestamp, then one keyed aggregate — the sessionize shuffle
    * shape, nothing global.
    */
  def timeWeightedAvg(df: DataFrame, key: String, ts: String,
                      value: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(value))
    val tUs = unix_micros(col(ts).cast("timestamp"))
    val dur = lead(tUs, 1).over(w) - tUs
    import Exact.d38
    df.select(col(key), col(value).cast("long").as("__v"), dur.as("__dur"))
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_samples"),
        sum(col("__dur")).as("span_us"),
        when(sum(col("__dur")) > 0L,
          round(sum(d38(col("__v")) * d38(col("__dur"))).cast("double") /
            sum(d38(col("__dur"))).cast("double"), 6)).as("twa"))
  }

  /** Out-of-orderness audit for WATERMARK SIZING: before configuring a
    * streaming job's `withWatermark`, measure how late the data
    * actually arrives. Per key, replay events in arrival order
    * (`arrivalCol` — an ingest sequence, offset, or arrival stamp) and
    * track the event-time high-water mark; an event's lateness is how
    * far its event time trails that mark. One row out: total events,
    * out-of-order events, counts beyond each candidate threshold, and
    * the max lateness — read off "watermark 60 s loses 0.3% of events,
    * 300 s loses none".
    *
    * Scale shape: one per-key window pass in arrival order (the same
    * single shuffle as sessionize), then a global one-row aggregate.
    */
  def latenessStats(df: DataFrame, key: String, ts: String,
                    arrivalCol: String,
                    thresholdsSec: Seq[Long] = Seq(60L, 300L, 900L))
    : DataFrame = {
    require(thresholdsSec.nonEmpty, "no thresholds")
    val w = Window.partitionBy(col(key))
      .orderBy(col(arrivalCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tsm = unix_micros(col(ts).cast("timestamp"))
    val late = df
      .select((max(tsm).over(w) - tsm).as("__late_us"))
    val aggs =
      count(lit(1)).as("n_events") +:
        sum(when(col("__late_us") > 0L, 1L).otherwise(0L))
          .as("n_out_of_order") +:
        thresholdsSec.map(t =>
          sum(when(col("__late_us") > t * 1000000L, 1L).otherwise(0L))
            .as(s"n_late_${t}s")) :+
        max(col("__late_us")).as("max_lateness_us")
    late.agg(aggs.head, aggs.tail: _*)
  }

  /** Session-grain behavior stats — the bot/abuse screening table: per
    * [[sessionize]]d session, the event count, duration, rate, and the
    * inter-arrival regularity (n·Σg²−(Σg)² over integer-second gaps).
    * Humans are bursty (high gap variance at a modest rate); scripted
    * traffic is fast AND metronomic (high rate, near-zero variance) —
    * the two columns a reviewer thresholds jointly.
    *
    * Exactness: gaps are floored-epoch second diffs, moments exact
    * longs, the rate one rounded division. Shape: the sessionize
    * window plus one session-grain aggregate — same shuffle as any
    * sessionization.
    *
    * @return (key, session_id, n_events, duration_sec, events_per_min,
    *         gap_var_n2) — gap_var_n2 is the n²-scaled variance
    *         n·Σg²−(Σg)² (exact; 0 for metronomic, null if < 2 gaps)
    */
  def sessionStats(df: DataFrame, key: String, ts: String,
                   order: Seq[Column], gapSeconds: Long): DataFrame = {
    val sess = sessionize(df, key, ts, order, gapSeconds)
    val w = Window.partitionBy(col(key), col("session_id"))
      .orderBy(order: _*)
    // unix_timestamp ≡ floor(epoch): the repo-wide second-floor rule
    // for sub-second event timestamps
    val sec = unix_timestamp(col(ts))
    val gap = sec - unix_timestamp(lag(col(ts), 1).over(w))
    sess.withColumn("__sec", sec).withColumn("__gap", gap)
      .groupBy(col(key), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("__sec")) - min(col("__sec"))).as("duration_sec"),
        count(col("__gap")).as("__ng"),
        coalesce(sum(col("__gap")), lit(0L)).as("__sg"),
        coalesce(sum(col("__gap") * col("__gap")), lit(0L)).as("__sgg"))
      .select(col(key), col("session_id"), col("n_events"),
        col("duration_sec"),
        when(col("duration_sec") > 0L,
          round(col("n_events").cast("double") * 60.0 /
            col("duration_sec").cast("double"), 6)).as("events_per_min"),
        when(col("__ng") > 1L,
          col("__ng") * col("__sgg") - col("__sg") * col("__sg"))
          .as("gap_var_n2"))
  }

  /** Rolling Pearson correlation of two integer measures over the
    * trailing `nRows`-row frame per key — time-varying dependence
    * ("are quantity and price moving together THIS quarter"), where
    * the global [[graft.ops.Stats.pearson]] gives one number for all
    * history. The five frame moments (n, Σx, Σy, Σxy, Σx², Σy²)
    * accumulate as EXACT decimal(38,0) window sums — x·y products are
    * formed in decimal BEFORE summation, because long moments wrap
    * silently once Σy² passes 2⁶³ (hit at the sf1 certification:
    * month-grain revenue squared at 10× scale crosses ~1e19) — the
    * correlation is one closed-form double per row over those exact
    * integers, the same engine-stable discipline as the global op.
    * Degenerate frames (fewer than 2 rows, zero variance) yield null.
    * Same single-shuffle partitioned-window shape as [[runningTotal]].
    */
  def rollingCorr(df: DataFrame, keys: Seq[String], order: Seq[Column],
                  x: Column, y: Column, nRows: Int,
                  as: String = "corr"): DataFrame = {
    require(nRows >= 2, s"nRows=$nRows")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(-(nRows - 1), Window.currentRow)
    val xd = x.cast("decimal(38,0)")
    val yd = y.cast("decimal(38,0)")
    val n = count(lit(1)).over(w).cast("decimal(38,0)")
    val sx = sum(xd).over(w)
    val sy = sum(yd).over(w)
    val sxy = sum((xd * yd).cast("decimal(38,0)")).over(w)
    val sxx = sum((xd * xd).cast("decimal(38,0)")).over(w)
    val syy = sum((yd * yd).cast("decimal(38,0)")).over(w)
    val covn = n * sxy - sx * sy
    val vxn = n * sxx - sx * sx
    val vyn = n * syy - sy * sy
    df.withColumn(as,
      when(n > 1 && vxn > 0 && vyn > 0,
        round(covn.cast("double") /
          sqrt(vxn.cast("double") * vyn.cast("double")), 6)))
  }

  /** Running drawdown per key: at each tick, how far the measure sits
    * below its running peak — the standard decline/health signal
    * ("revenue is 34% off its high") for any monotonically-watched
    * series. `drawdown_cents = peak − v` is exact integer; the ratio
    * is one rounded division (null until a positive peak exists).
    * Same single-shuffle partitioned-window shape as [[runningTotal]].
    */
  /** Global-order `lead(value)` WITHOUT the single-partition sort a bare
    * `Window.orderBy(key)` plans (Spark warns "No Partition Defined",
    * then funnels the whole input through one task — the shape that
    * cannot survive a 100× input). Two-phase instead:
    *
    *  1. bucket on `key` into `numRanges` contiguous key ranges, so
    *     `lead` runs per-range in parallel. Boundaries are DETERMINISTIC
    *     in-plan values — one `percentile_approx` aggregate of the key,
    *     broadcast back and counted against each row — never
    *     `repartitionByRange`'s sampled `RangePartitioner` boundaries:
    *     those depend on an RDD-id-derived sample seed, so two plan
    *     branches consuming the same range exchange agree only while
    *     `ReuseExchange` deduplicates them. Here every branch computes
    *     the same bucket id from the same deterministic aggregate, so
    *     the stitch join below cannot mis-align even with reuse off;
    *  2. stitch: each range's LAST row pairs with the first row of the
    *     next non-empty range — derived from a per-range firsts table
    *     (`numRanges` rows), broadcast back. Both the local lead and the
    *     firsts carry `(key, value)` STRUCTS, and end-of-range is
    *     detected on the struct's KEY — a null `valueCol` on the
    *     successor row therefore stays null instead of being conflated
    *     with "no successor in this range" (a bare
    *     `coalesce(lead, nextFirst)` would substitute the next range's
    *     first value for a legitimate null lead).
    *
    * Output is byte-identical to the global window, including null
    * `valueCol` runs: within a range the local lead IS the global
    * successor, and across the boundary the stitch row is it. The final
    * row overall has no successor and keeps a null `asCol`, exactly
    * like the global form. Rows are returned range-bucketed (not
    * globally sorted) — callers wanting a total output order still own
    * their final `orderBy`.
    *
    * `key` must be NUMERIC (the boundary aggregate is a percentile),
    * non-null, and unique per row (it is the total order); `valueCol`
    * may be null. `numRanges` bounds the firsts table, default matches
    * the shuffle width.
    */
  def leadRanged(df: DataFrame, keyCol: String, valueCol: String,
                 asCol: String, numRanges: Int = 32): DataFrame = {
    require(numRanges >= 2, s"numRanges=$numRanges (need >= 2)")
    // deterministic range boundaries: percentile_approx is a
    // deterministic aggregate of the data (no sample seed), so every
    // branch that recomputes it lands on identical cut points
    val cuts = df.agg(percentile_approx(col(keyCol),
      lit((1 until numRanges).map(_.toDouble / numRanges).toArray),
      lit(10000)).as("__cuts"))
    val bucketed = df.crossJoin(broadcast(cuts))
      .withColumn("__pid",
        size(filter(col("__cuts"), c => c <= col(keyCol))))
      .drop("__cuts")
      .repartition(numRanges, col("__pid"))
    val kv = struct(col(keyCol).as("k"), col(valueCol).as("v"))
    val wl = Window.partitionBy(col("__pid")).orderBy(col(keyCol))
    val local = bucketed.withColumn("__ld", lead(kv, 1).over(wl))
    // one row per NON-EMPTY range; lead over this tiny frame skips
    // empty ranges, so the stitch target is the true global successor.
    // min over the struct picks the range's first row (keys unique, so
    // the value field is never compared).
    val firsts = local.groupBy(col("__pid")).agg(min(kv).as("__first"))
    val wt = Window.orderBy(col("__first.k")) // numRanges rows — driver-safe
    val nexts = firsts.select(col("__pid"),
      lead(col("__first"), 1).over(wt).as("__nf"))
    local.join(broadcast(nexts), Seq("__pid"), "left")
      .withColumn(asCol,
        when(col("__ld.k").isNotNull, col("__ld.v"))
          .when(col("__nf.k").isNotNull, col("__nf.v")))
      .drop("__pid", "__ld", "__nf")
  }

  def drawdown(df: DataFrame, keys: Seq[String], tickCol: String,
               centsCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tickCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("peak_cents", max(col(centsCol)).over(w))
      .withColumn("drawdown_cents", col("peak_cents") - col(centsCol))
      .withColumn("dd_ratio",
        when(col("peak_cents") > 0L,
          round(col("drawdown_cents").cast("double") /
            col("peak_cents").cast("double"), 6)))
  }
}
