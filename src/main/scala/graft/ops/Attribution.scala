package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Marketing-style touch attribution: which earlier touch events (view,
  * click, …) get credit for a conversion event (purchase)? Two standard
  * models:
  *  - LAST TOUCH: the whole conversion credits its most recent touch
  *    within the lookback window — computed in ONE per-entity window
  *    pass (the carried last-touch column), no join at all;
  *  - LINEAR: the conversion's value splits equally across every touch
  *    in the window — the candidate pairs come from the bucketed
  *    interval join ([[RangeJoin.intervalJoin]]), the same hot-key-safe
  *    machinery the range-join family uses, never a raw inequality
  *    join.
  * (Sequence-analytics sibling of [[Funnel]]/[[Transitions]]; the
  * reference has no event operators.)
  *
  * Simultaneity contract: a touch at exactly the conversion's timestamp
  * counts; among same-timestamp touches the lexicographically LAST type
  * wins last-touch credit (deterministic, engine-stable).
  */
object Attribution {

  /** One row per conversion: entity, conversion ts/value, `channel` =
    * the credited touch type (null when no touch inside `lookbackSec`).
    */
  def lastTouch(events: DataFrame, entityCol: String, tsCol: String,
                typeCol: String, valueCol: String, touchTypes: Seq[String],
                convType: String, lookbackSec: Long): DataFrame = {
    require(touchTypes.nonEmpty, "touchTypes required")
    require(!touchTypes.contains(convType), "conversion cannot be a touch")
    require(lookbackSec > 0, s"lookbackSec=$lookbackSec")
    val isTouch = col(typeCol).isin(touchTypes: _*)
    val relevant = events
      .where(isTouch || col(typeCol) === convType)
      .select(col(entityCol), col(tsCol).cast("timestamp").as("__ts"),
        col(typeCol), col(valueCol))
    // touches sort before the conversion at the same instant (0 < 1),
    // so the running last-touch already includes same-ts touches when
    // the conversion row reads it
    val byTime = Window.partitionBy(col(entityCol))
      .orderBy(col("__ts"), when(isTouch, 0).otherwise(1), col(typeCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    relevant
      .withColumn("__lt_type", last(when(isTouch, col(typeCol)),
        ignoreNulls = true).over(byTime))
      .withColumn("__lt_ts", last(when(isTouch, col("__ts")),
        ignoreNulls = true).over(byTime))
      .where(col(typeCol) === convType)
      .select(col(entityCol), col("__ts").as("conv_ts"), col(valueCol),
        when(col("__lt_ts") >= col("__ts") - expr(s"INTERVAL $lookbackSec SECONDS"),
          col("__lt_type")).as("channel"))
  }

  /** One row per (conversion, touch-in-window) pair with `credit` =
    * conversion value / touches-in-window — linear multi-touch. Pairs
    * ride the bucketed interval join; conversions with no touch in the
    * window are absent (their value is unattributed). Conversions are
    * pre-aggregated per (entity, instant) — simultaneous conversions
    * merge into one combined-value conversion, so the per-instant
    * split can never under-credit (a per-row split over shared
    * (entity, ts) would divide by the combined pair count).
    */
  def linearCredit(events: DataFrame, entityCol: String, tsCol: String,
                   typeCol: String, valueCol: String, touchTypes: Seq[String],
                   convType: String, lookbackSec: Long,
                   bucketWidthSec: Long = 3600L): DataFrame = {
    require(touchTypes.nonEmpty, "touchTypes required")
    require(!touchTypes.contains(convType), "conversion cannot be a touch")
    require(lookbackSec > 0, s"lookbackSec=$lookbackSec")
    val touches = events.where(col(typeCol).isin(touchTypes: _*))
      .select(col(entityCol), col(tsCol).cast("timestamp").as("touch_ts"),
        col(typeCol).as("channel"))
    val windows = events.where(col(typeCol) === convType)
      .groupBy(col(entityCol), col(tsCol).cast("timestamp").as("conv_ts"))
      .agg(sum(col(valueCol)).as("conv_value"))
      .withColumn("win_start",
        col("conv_ts") - expr(s"INTERVAL $lookbackSec SECONDS"))
    val pairs = RangeJoin.intervalJoin(touches, windows, Seq(entityCol),
      "touch_ts", "win_start", "conv_ts", bucketWidth = bucketWidthSec)
    val perConv = Window.partitionBy(col(entityCol), col("conv_ts"))
    pairs.withColumn("credit",
      col("conv_value").cast("double") / count(lit(1)).over(perConv))
  }

  /** Time-decay attribution: each in-window touch earns credit
    * proportional to 2^(−age/halflife) — a touch one halflife before
    * the conversion is worth half a same-instant touch. Unlike
    * [[linearCredit]]'s per-touch double division, the decay weights
    * are FLOOR-QUANTIZED to a micro grid and each touch's credit is an
    * exact integer floor-division `⌊value·w / Σw⌋` — channel rollups
    * then sum exact longs, bit-stable under any partitioning (the
    * [[Decay]] fixed-grid discipline applied to credit assignment).
    * The sub-cent remainder of each conversion (< 1 cent × touches) is
    * deliberately dropped, not redistributed — documented, exact, and
    * twin-expressible.
    *
    * Scale shape: identical to [[linearCredit]] — a bucketed interval
    * join at touch grain, one per-conversion window sum, no data-grain
    * sort.
    */
  def timeDecayCredit(events: DataFrame, entityCol: String, tsCol: String,
                      typeCol: String, valueCol: String,
                      touchTypes: Seq[String], convType: String,
                      lookbackSec: Long, halflifeSec: Long,
                      bucketWidthSec: Long = 3600L): DataFrame = {
    require(touchTypes.nonEmpty, "touchTypes required")
    require(!touchTypes.contains(convType), "conversion cannot be a touch")
    require(lookbackSec > 0 && halflifeSec > 0,
      s"lookbackSec=$lookbackSec halflifeSec=$halflifeSec")
    val touches = events.where(col(typeCol).isin(touchTypes: _*))
      .select(col(entityCol), col(tsCol).cast("timestamp").as("touch_ts"),
        col(typeCol).as("channel"))
    val windows = events.where(col(typeCol) === convType)
      .groupBy(col(entityCol), col(tsCol).cast("timestamp").as("conv_ts"))
      .agg(sum(col(valueCol)).as("conv_value"))
      .withColumn("win_start",
        col("conv_ts") - expr(s"INTERVAL $lookbackSec SECONDS"))
    val pairs = RangeJoin.intervalJoin(touches, windows, Seq(entityCol),
      "touch_ts", "win_start", "conv_ts", bucketWidth = bucketWidthSec)
    val age = unix_timestamp(col("conv_ts")) - unix_timestamp(col("touch_ts"))
    val wMicro = floor(
      pow(lit(2.0), -age.cast("double") / halflifeSec.toDouble) * 1e6)
      .cast("long")
    val perConv = Window.partitionBy(col(entityCol), col("conv_ts"))
    pairs
      .withColumn("__w", wMicro)
      .withColumn("__wsum", sum(col("__w")).over(perConv))
      .withColumn("credit",
        when(col("__wsum") > 0L,
          Pca.floorDivQ(col("conv_value") * col("__w"), col("__wsum")))
          .otherwise(lit(0L)))
      .drop("__w", "__wsum")
  }

  /** Position-based (U-shaped) attribution: the FIRST and LAST touch
    * in the lookback window each take `edgeWeightMicro` (default 40%)
    * of the conversion, the middle touches split the rest evenly —
    * the marketer's compromise between first-touch discovery credit
    * and last-touch closing credit. Conventions: a single touch takes
    * 100%, exactly two touches split 50/50.
    *
    * Same exactness discipline as [[timeDecayCredit]]: weights live on
    * an integer micro grid (the middle share is itself a floor
    * division), each credit is `⌊value·w / Σw⌋` in exact integers, and
    * the sub-cent remainder is dropped, not redistributed. Position
    * rank orders by (touch_ts, channel); duplicate touches tie
    * arbitrarily between themselves, which leaves the result multiset
    * (and every per-channel rollup) unchanged.
    *
    * Scale shape: the same bucketed interval join, plus one
    * per-conversion-window rank — bounded by touches per window, never
    * a data-grain global sort.
    */
  def positionCredit(events: DataFrame, entityCol: String, tsCol: String,
                     typeCol: String, valueCol: String,
                     touchTypes: Seq[String], convType: String,
                     lookbackSec: Long, bucketWidthSec: Long = 3600L,
                     edgeWeightMicro: Long = 400000L): DataFrame = {
    require(touchTypes.nonEmpty, "touchTypes required")
    require(!touchTypes.contains(convType), "conversion cannot be a touch")
    require(lookbackSec > 0, s"lookbackSec=$lookbackSec")
    require(edgeWeightMicro > 0 && 2 * edgeWeightMicro <= 1000000L,
      s"edgeWeightMicro=$edgeWeightMicro")
    val touches = events.where(col(typeCol).isin(touchTypes: _*))
      .select(col(entityCol), col(tsCol).cast("timestamp").as("touch_ts"),
        col(typeCol).as("channel"))
    val windows = events.where(col(typeCol) === convType)
      .groupBy(col(entityCol), col(tsCol).cast("timestamp").as("conv_ts"))
      .agg(sum(col(valueCol)).as("conv_value"))
      .withColumn("win_start",
        col("conv_ts") - expr(s"INTERVAL $lookbackSec SECONDS"))
    val pairs = RangeJoin.intervalJoin(touches, windows, Seq(entityCol),
      "touch_ts", "win_start", "conv_ts", bucketWidth = bucketWidthSec)
    val perConv = Window.partitionBy(col(entityCol), col("conv_ts"))
    val byPos = perConv.orderBy(col("touch_ts"), col("channel"))
    pairs
      .withColumn("__rn", row_number().over(byPos))
      .withColumn("__n", count(lit(1)).over(perConv))
      .withColumn("__w",
        when(col("__n") === 1, lit(1000000L))
          .when(col("__n") === 2, lit(500000L))
          .when(col("__rn") === 1 || col("__rn") === col("__n"),
            lit(edgeWeightMicro))
          .otherwise(Pca.floorDivQ(lit(1000000L - 2 * edgeWeightMicro),
            col("__n") - 2)))
      .withColumn("__wsum", sum(col("__w")).over(perConv))
      .withColumn("credit",
        when(col("__wsum") > 0L,
          Pca.floorDivQ(col("conv_value") * col("__w"), col("__wsum")))
          .otherwise(lit(0L)))
      .drop("__w", "__wsum", "__rn", "__n")
  }
}
