package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Column profiling — the table-level DQ summary every ETL run logs
  * before gating (extends the reference's per-rule gates,
  * dq_non_negative / dq_uniques, with the standard profile sweep).
  *
  * ONE aggregation pass computes every column's metrics simultaneously
  * (a per-column loop would re-scan the table per column — the classic
  * profiling mistake at warehouse scale); the single wide result row is
  * then unpivoted driver-side into (column, metric...) rows — bounded by
  * the column count, not the data.
  */
object Profile {

  /** @return one row per profiled column:
    *         (column, n_rows, n_nulls, n_distinct) — `n_distinct` is the
    *         exact distinct count of non-null values.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "no columns to profile")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        count_distinct(col(c)).as(s"__distinct_$c"))
    } :+ count(lit(1)).as("__rows")
    val row: Row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val out = cols.map { c =>
      (c, row.getAs[Long]("__rows"), row.getAs[Long](s"__nulls_$c"),
        row.getAs[Long](s"__distinct_$c"))
    }
    df.sparkSession.createDataFrame(out)
      .toDF("column", "n_rows", "n_nulls", "n_distinct")
  }

  /** Mask (pattern) profiling: every value is reduced to its character-
    * class skeleton — uppercase→`A`, lowercase→`a`, digits→`9`, all
    * else kept — plus the run-collapsed form (`AAA-999`→`A-9`), and
    * the masks are counted per column. The standard raw-feed
    * fingerprint: one glance shows whether a column is `Aa#9` ids,
    * `9.9` numerics, or free text, and a new mask appearing between
    * loads is a format regression no type check catches.
    *
    * ONE scan: columns stack through a single `explode` of
    * (name, value) structs (a per-column union would rescan the table
    * per column), then a (column, mask)-grain aggregate. Mask
    * cardinality is bounded by format diversity, not rows.
    */
  def maskProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "no columns to profile")
    val stacked = df.select(explode(array(cols.map(c =>
      struct(lit(c).as("column"),
        col(c).cast("string").as("value"))): _*)).as("s"))
      .select(col("s.column").as("column"), col("s.value").as("value"))
    val mask = regexp_replace(regexp_replace(regexp_replace(
      coalesce(col("value"), lit("")),
      "[A-Z]", "A"), "[a-z]", "a"), "[0-9]", "9")
    val collapsed = regexp_replace(regexp_replace(regexp_replace(
      col("mask"), "A+", "A"), "a+", "a"), "9+", "9")
    stacked.withColumn("mask", mask)
      .withColumn("mask_collapsed", collapsed)
      .groupBy(col("column"), col("mask"), col("mask_collapsed"))
      .agg(count(lit(1)).as("n"))
  }

  /** Type inference over string-valued columns: classify each trimmed
    * value as `empty | bool | int | decimal | date | string` (first
    * match wins, in that order) and count per (column, type) — the
    * schema-inference pass a raw DSV/JSON landing zone runs before
    * declaring column types. Same one-scan stacking as [[maskProfile]].
    *
    * Classes are anchored character-class regexes only (identical
    * semantics in Java regex and RE2, so the SQL twin is exact):
    * int `[+-]?[0-9]+`, decimal `[+-]?[0-9]*\.[0-9]+`,
    * date `9999-99-99`, bool `true|false` case-insensitive.
    */
  def inferTypes(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "no columns to profile")
    val stacked = df.select(explode(array(cols.map(c =>
      struct(lit(c).as("column"),
        col(c).cast("string").as("value"))): _*)).as("s"))
      .select(col("s.column").as("column"),
        trim(col("s.value")).as("value"))
    val cls = when(col("value").isNull || col("value") === "", "empty")
      .when(lower(col("value")).isin("true", "false"), "bool")
      .when(col("value").rlike("^[+-]?[0-9]+$"), "int")
      .when(col("value").rlike("^[+-]?[0-9]*\\.[0-9]+$"), "decimal")
      .when(col("value").rlike("^[0-9]{4}-[0-9]{2}-[0-9]{2}$"), "date")
      .otherwise("string")
    stacked.withColumn("inferred_type", cls)
      .groupBy(col("column"), col("inferred_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Equi-width histogram of `value` over `[lo, hi)` in `nBuckets`
    * buckets, per group — the distribution view the single-number
    * profile metrics can't give. Bucket `b` covers
    * `[lo + b·width, lo + (b+1)·width)`; values below `lo` land in
    * bucket 0's underflow twin `-1`, values at or above `hi` in bucket
    * `nBuckets` — explicit overflow buckets instead of silent clipping,
    * so the histogram always sums to the group count. Bucket index
    * arithmetic is integer over SCALED values (the caller picks the
    * grain, e.g. cents), making bucket edges engine-exact — no
    * double-width rounding at the boundaries.
    *
    * Scale shape: map-only bucket assignment, one (group, bucket)-grain
    * aggregate — the same cost as any rollup; empty buckets are absent
    * (the consumer densifies if it needs zeros, cf. [[GapFill]]).
    */
  def histogram(df: DataFrame, groupCols: Seq[String],
                value: org.apache.spark.sql.Column,
                lo: Long, hi: Long, nBuckets: Int): DataFrame = {
    require(nBuckets > 0, s"nBuckets=$nBuckets")
    require(hi > lo, s"empty range [$lo, $hi)")
    val width = (hi - lo + nBuckets - 1) / nBuckets // ceil: covers [lo, hi)
    df.withColumn("__v", value.cast("long"))
      .withColumn("bucket",
        when(col("__v") < lo, lit(-1))
          .when(col("__v") >= hi, lit(nBuckets))
          .otherwise(expr(s"CAST((__v - ${lo}L) div ${width}L AS INT)")))
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(count(lit(1)).as("n"),
        min(col("__v")).as("v_min"), max(col("__v")).as("v_max"))
  }

  /** Equi-depth (equal-frequency) histogram of `value` in `nBuckets`
    * buckets per group — the skew-proof complement of [[histogram]]:
    * bucket edges are the group's own interpolated quantiles, so a
    * heavy-tailed column still yields ~n/B rows per bucket instead of
    * one hot bucket and B−1 empties.
    *
    * Bucket `b ∈ [1, nBuckets]` holds values v with
    * `q_{(b−1)/B} < v ≤ q_{b/B}` (boundaries computed at the interior
    * quantiles only; boundary-equal values go DOWN, so the mapping is a
    * total function). Exact-duplicate runs straddling an edge all land
    * in one bucket — depths are near-equal, not exactly equal, which is
    * the standard equi-depth contract.
    *
    * Scale shape: boundaries come from ONE group-grain exact
    * [[org.apache.spark.sql.functions.percentile]] aggregate (state is
    * bounded by distinct values per group, not rows — no per-group
    * window over the data, no single-partition sort), the tiny
    * boundary table joins back on the group key, bucket assignment is
    * map-only, and the result aggregates at (group, bucket) grain.
    *
    * Determinism: values are caller-scaled integers (e.g. cents);
    * boundaries are interpolated doubles, but both engines compute the
    * same linear interpolation from the same exact integers, so the
    * `boundary < value` comparisons agree (the [[Anomaly.winsorize]]
    * precedent).
    */
  def equiDepthHistogram(df: DataFrame, groupCols: Seq[String],
                         value: org.apache.spark.sql.Column,
                         nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, s"nBuckets=$nBuckets")
    val ps = (1 until nBuckets).map(i => lit(i.toDouble / nBuckets))
    val bounds = df.groupBy(groupCols.map(col): _*)
      .agg(percentile(value.cast("double"), array(ps: _*)).as("__bs"))
    df.withColumn("__v", value.cast("long"))
      .join(bounds, groupCols)
      .withColumn("bucket",
        (size(filter(col("__bs"), b => b < col("__v").cast("double"))) + 1)
          .cast("int"))
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(count(lit(1)).as("n"),
        min(col("__v")).as("v_min"), max(col("__v")).as("v_max"))
  }

  /** Functional-dependency violation audit: for each candidate FD
    * `determinant → dependent`, how many determinant groups bind more
    * than one distinct dependent value (nulls count as a value — a key
    * that maps to both 'A' and NULL is still ambiguous). The schema-
    * constraint complement of the reference's row-level gates: its
    * `dq_uniques` is the special case `PK → everything`; this audits
    * any claimed dependency ("an order has one customer", "a nation is
    * in one region") and quantifies the blast radius when it fails.
    *
    * One row per FD: `fd, n_groups, n_violating_groups,
    * n_rows_in_violating, max_distinct_dependent`. Each FD is one keyed
    * aggregate at its own determinant grain (different keys cannot
    * share a shuffle); the union is plan-level, not a rescan barrier.
    */
  def fdViolations(df: DataFrame, fds: Seq[(Seq[String], String)]): DataFrame = {
    require(fds.nonEmpty, "no FDs to audit")
    fds.map { case (det, dep) =>
      require(det.nonEmpty, "empty determinant")
      require(!det.contains(dep), s"FD ${det.mkString(",")} -> $dep is trivial")
      df.groupBy(det.map(col): _*)
        .agg(count(lit(1)).as("__n"),
          count_distinct(coalesce(col(dep).cast("string"),
            lit("\u0000null"))).as("__nd"))
        .agg(lit(s"${det.mkString(",")} -> $dep").as("fd"),
          count(lit(1)).as("n_groups"),
          sum(when(col("__nd") > 1L, 1L).otherwise(0L))
            .as("n_violating_groups"),
          sum(when(col("__nd") > 1L, col("__n")).otherwise(0L))
            .as("n_rows_in_violating"),
          max(col("__nd")).as("max_distinct_dependent"))
    }.reduce(_ unionByName _)
  }
}
