package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: left rows with a point timestamp against right
  * rows with a `[start, end]` interval, matched per key when
  * `start <= ts <= end`.
  *
  * Spark plans a naive `ON key = key AND ts BETWEEN start AND end` as an
  * equi-join on the key followed by a per-key nested filter — fine until
  * one key's row counts are large, where it degenerates to O(n·m) per
  * key. The scale-safe shape buckets the time axis:
  *
  *   - left rows land in ONE bucket: `ts div width`;
  *   - right intervals explode into EVERY bucket they overlap
  *     (`sequence(start div w, end div w)` — fan-out is bounded by
  *     interval length / width);
  *   - equi-join on (key, bucket), then the exact `BETWEEN` filter.
  *
  * Each matching pair is emitted exactly once (a left row has exactly one
  * bucket, and integral division is monotone, so the interval's bucket
  * sequence covers it exactly once). The shuffle is keyed on
  * (key, bucket), so a hot key spreads across its time range instead of
  * concentrating on one task; choose `bucketWidth` near the typical
  * interval length (fan-out ≈ 1-2 buckets per interval).
  */
object RangeJoin {

  private def micros(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** @param bucketWidth bucket size in SECONDS along the time axis. */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightStart: String, rightEnd: String,
                   bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth=$bucketWidth")
    val overlap = left.columns.intersect(right.columns).filterNot(keys.contains)
    require(overlap.isEmpty, s"overlapping non-key columns: ${overlap.mkString(",")}")
    val wMicros = bucketWidth * 1000000L
    val l = left
      .withColumn("__lm", micros(col(leftTs)))
      .withColumn("__bucket", expr(s"__lm div $wMicros"))
    val r = right
      .withColumn("__rs", micros(col(rightStart)))
      .withColumn("__re", micros(col(rightEnd)))
      .where(col("__rs") <= col("__re")) // empty/inverted intervals match nothing
      .withColumn("__bucket",
        explode(sequence(expr(s"__rs div $wMicros"), expr(s"__re div $wMicros"))))
    l.join(r, keys :+ "__bucket")
      .where(col("__lm") >= col("__rs") && col("__lm") <= col("__re"))
      .drop("__lm", "__rs", "__re", "__bucket")
  }

  /** The same interval-join semantics as a FIRST-CLASS operator:
    * [[graft.plans.IntervalJoinPlan]] → [[graft.plans.IntervalJoinStrategy]]
    * → [[graft.plans.IntervalJoinExec]] interval-sweep merge (custom-
    * operator ladder rung (c), the same two-engine proof pattern as
    * [[graft.ops.AsOf.asofJoinNative]]). Registers the strategy on the
    * session idempotently.
    *
    * Result rows are identical to [[intervalJoin]] (any `bucketWidth`):
    * inner join on equal keys with `rightStart <= leftTs <= rightEnd`,
    * null keys/times/bounds matching nothing. Output = all left columns,
    * then all right columns; non-key names must be disjoint. No explode
    * fan-out and no bucket re-filter, but the shuffle clusters on the key
    * ALONE — prefer [[intervalJoin]] under heavy key skew (its
    * (key, bucket) shuffle spreads a hot key over its time range).
    */
  def intervalJoinNative(left: DataFrame, right: DataFrame, keys: Seq[String],
                         leftTs: String, rightStart: String,
                         rightEnd: String): DataFrame = {
    import graft.plans.{IntervalJoinPlan, IntervalJoinStrategy}
    import org.apache.spark.sql.graftbridge.PlanBridge
    val overlap = left.columns.intersect(right.columns).filterNot(keys.contains)
    require(overlap.isEmpty, s"overlapping non-key columns: ${overlap.mkString(",")}")
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(IntervalJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ IntervalJoinStrategy
    // equi-join null semantics (null keys match nothing) must be imposed
    // BEFORE the ordering-based merge, which would group null keys; the
    // internal __lt/__rs/__re columns give both sides one comparable
    // timestamp type without touching user columns
    val notNull = (df: DataFrame) =>
      keys.foldLeft(df)((d, k) => d.where(col(k).isNotNull))
    val l = notNull(left).withColumn("__lt", micros(col(leftTs)))
    // shared key names on the right get an internal prefix so the joined
    // output (left ++ right) stays name-unambiguous, then drop
    val rPrepped = notNull(right).select(right.columns.toIndexedSeq.map { c =>
      if (keys.contains(c)) col(c).as(s"__r_$c") else col(c)
    }: _*)
      .withColumn("__rs", micros(col(rightStart)))
      .withColumn("__re", micros(col(rightEnd)))
    val lPlan = l.queryExecution.analyzed
    val rPlan = rPrepped.queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column '$name'"))
    val joined = PlanBridge.ofRows(spark, IntervalJoinPlan(lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(k => attr(rPlan, s"__r_$k")),
      attr(lPlan, "__lt"), attr(rPlan, "__rs"), attr(rPlan, "__re")))
    joined.drop((keys.map(k => s"__r_$k") ++ Seq("__lt", "__rs", "__re")): _*)
  }
}
