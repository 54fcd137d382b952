package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the latest right row
  * with `rightTs <= leftTs` per key — the lookup every training-data /
  * time-series pipeline needs (attach the dimension snapshot that was
  * current when the event happened).
  *
  * Spark has no native as-of join; the preference ladder (compose
  * built-ins before custom plans) lands on the union + last-observation-
  * carried-forward window:
  *
  *   1. union left (tag 1) and right (tag 0) rows on a common `__ts`;
  *   2. per key, sort by (`__ts`, tag) — right-before-left on equal
  *      timestamps gives inclusive `<=` semantics;
  *   3. `last(rightCol, ignoreNulls)` over the unbounded-preceding frame
  *      carries the newest right values forward;
  *   4. keep the left rows.
  *
  * One shuffle on the key (same as any equi-join), no range explosion,
  * no per-key driver loop — linear at 100 TB. Right side must be unique
  * per (key, rightTs); dedupe first ([[Windows.latestPerKey]]) or the
  * carried value is order-nondeterministic.
  *
  * NULL-key contract (all three entry points, matching the DuckDB
  * `ASOF LEFT JOIN` oracle's equi-join semantics): a NULL in any join
  * key matches nothing. Right rows with a NULL key are dropped before
  * the join; left rows with a NULL key are KEPT, with null right values
  * (left-outer semantics). Without the right-side filter the window
  * form would group null-key rows into their own partition and carry
  * null-key right values onto null-key left rows — equality that no
  * equi-join performs.
  */
object AsOf {

  /** `col IS NOT NULL` over every join key — the pre-join filter that
    * enforces the NULL-key contract on the right side.
    */
  private def keysNotNull(keys: Seq[String]): Column =
    keys.map(col(_).isNotNull).reduce(_ && _)

  def asofJoin(left: DataFrame, right0: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String): DataFrame = {
    val right = right0.where(keysNotNull(keys))
    val leftCols = left.columns.filterNot(keys.contains).filterNot(_ == leftTs)
    val rightCols = right.columns.filterNot(keys.contains).filterNot(_ == rightTs)
    require(leftCols.intersect(rightCols).isEmpty,
      s"overlapping non-key columns: ${leftCols.intersect(rightCols).mkString(",")}")

    def nullOf(df: DataFrame, c: String): Column =
      lit(null).cast(df.schema(c).dataType).as(c)

    val l = left.select(
      keys.map(col) ++
        Seq(col(leftTs).cast("timestamp").as("__ts"), lit(1).as("__tag")) ++
        leftCols.map(col) ++ rightCols.map(nullOf(right, _)): _*)
    val r = right.select(
      keys.map(col) ++
        Seq(col(rightTs).cast("timestamp").as("__ts"), lit(0).as("__tag")) ++
        leftCols.map(nullOf(left, _)) ++ rightCols.map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(r).select(
      keys.map(col) ++ Seq(col("__ts"), col("__tag")) ++ leftCols.map(col) ++
        rightCols.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
    filled.where(col("__tag") === 1)
      .select(keys.map(col) ++ Seq(col("__ts").as(leftTs)) ++
        (leftCols ++ rightCols).map(col): _*)
  }

  /** FORWARD as-of join: for each left row, the EARLIEST right row
    * with `rightTs >= leftTs` per key — "match the event to the next
    * shipment/order", the mirror of [[asofJoin]]'s
    * latest-at-or-before. Same union + carried-value window, with the
    * order reversed: sort by (`__ts` desc, tag) and carry the newest
    * right values backward; right-before-left on equal timestamps
    * keeps `>=` inclusive. Identical one-shuffle scale shape; same
    * unique-right-per-(key, ts) requirement.
    */
  def asofJoinForward(left: DataFrame, right0: DataFrame, keys: Seq[String],
                      leftTs: String, rightTs: String): DataFrame = {
    val right = right0.where(keysNotNull(keys))
    val leftCols = left.columns.filterNot(keys.contains).filterNot(_ == leftTs)
    val rightCols = right.columns.filterNot(keys.contains).filterNot(_ == rightTs)
    require(leftCols.intersect(rightCols).isEmpty,
      s"overlapping non-key columns: ${leftCols.intersect(rightCols).mkString(",")}")

    def nullOf(df: DataFrame, c: String): Column =
      lit(null).cast(df.schema(c).dataType).as(c)

    val l = left.select(
      keys.map(col) ++
        Seq(col(leftTs).cast("timestamp").as("__ts"), lit(1).as("__tag")) ++
        leftCols.map(col) ++ rightCols.map(nullOf(right, _)): _*)
    val r = right.select(
      keys.map(col) ++
        Seq(col(rightTs).cast("timestamp").as("__ts"), lit(0).as("__tag")) ++
        leftCols.map(nullOf(left, _)) ++ rightCols.map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").desc, col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(r).select(
      keys.map(col) ++ Seq(col("__ts"), col("__tag")) ++ leftCols.map(col) ++
        rightCols.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
    filled.where(col("__tag") === 1)
      .select(keys.map(col) ++ Seq(col("__ts").as(leftTs)) ++
        (leftCols ++ rightCols).map(col): _*)
  }

  /** The same as-of semantics as a FIRST-CLASS operator:
    * [[graft.plans.AsOfJoinPlan]] → [[graft.plans.AsOfJoinStrategy]] →
    * [[graft.plans.AsOfJoinExec]] streaming merge (custom-operator ladder
    * rung (c)). Registers the strategy on the session idempotently.
    *
    * Output = all left columns, then all right columns (right nullable);
    * column names must be disjoint. Result rows are identical to
    * [[asofJoin]] restricted to the same columns.
    */
  def asofJoinNative(left: DataFrame, right0: DataFrame, keys: Seq[String],
                     leftTs: String, rightTs: String): DataFrame = {
    import graft.plans.{AsOfJoinPlan, AsOfJoinStrategy}
    import org.apache.spark.sql.graftbridge.PlanBridge
    // NULL-key contract: the exec's natural key ordering treats NULL as
    // equal to NULL, so null-key right rows must be dropped up front —
    // left null-key rows then merge against an empty right run and emit
    // nulls, identical to the composed forms above.
    val right = right0.where(keysNotNull(keys))
    val rightCols = right.columns.filterNot(keys.contains).filterNot(_ == rightTs)
    require(left.columns.intersect(rightCols).isEmpty,
      s"overlapping non-key columns: ${left.columns.intersect(rightCols).mkString(",")}")
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    // mixed datetime flavors (TimestampNTZ parquet vs a cast-to-LTZ
    // probe column, or a date vs a timestamp) are coerced to a common
    // type on an INTERNAL column — per-side casts are monotonic, so the
    // as-of order is unchanged and the user-visible left schema keeps
    // its original time type. Without this the plan's equal-type
    // invariant throws the moment an input flips flavor (the r6
    // regression: events.ts read back as TimestampNTZ).
    val commonTime = commonTimeType(
      left.schema(leftTs).dataType, right.schema(rightTs).dataType)
    // remember whether the cast column was added rather than probing
    // columns afterwards — a user frame that happens to carry a
    // "__l_asof_ts" column must not hijack the join time
    val (lPrepped, lTimeName) = commonTime match {
      case Some(t) if t != left.schema(leftTs).dataType =>
        (left.withColumn("__l_asof_ts", col(leftTs).cast(t)), "__l_asof_ts")
      case _ => (left, leftTs)
    }
    // shared key/time names on the right get an internal prefix so the
    // joined output (left ++ right) stays name-unambiguous, then drop
    val rPrepped = right.select(right.columns.toIndexedSeq.map { c =>
      if (c == rightTs) {
        val cast = commonTime.fold(col(c))(col(c).cast(_))
        cast.as(s"__r_$c")
      } else if (keys.contains(c)) col(c).as(s"__r_$c")
      else col(c)
    }: _*)
    val lPlan = lPrepped.queryExecution.analyzed
    val rPlan = rPrepped.queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column '$name'"))
    val joined = PlanBridge.ofRows(spark, AsOfJoinPlan(lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(k => attr(rPlan, s"__r_$k")),
      attr(lPlan, lTimeName), attr(rPlan, s"__r_$rightTs")))
    val internal = keys.map(k => s"__r_$k") :+ s"__r_$rightTs"
    joined.drop(
      (if (lTimeName == "__l_asof_ts") internal :+ "__l_asof_ts"
       else internal): _*)
  }

  /** Common comparison type for a mixed datetime pair: any side that is
    * instant-flavored (`TimestampType`) pulls the pair to LTZ; otherwise
    * NTZ. Non-datetime or already-equal pairs return the left type only
    * when equal, else None (caller keeps the strict-type error).
    */
  private[graft] def commonTimeType(
      a: org.apache.spark.sql.types.DataType,
      b: org.apache.spark.sql.types.DataType)
    : Option[org.apache.spark.sql.types.DataType] = {
    import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
    val datetime: Set[org.apache.spark.sql.types.DataType] =
      Set(TimestampType, TimestampNTZType, DateType)
    if (a == b) None // equal types need no coercion column
    else if (datetime(a) && datetime(b))
      Some(if (a == TimestampType || b == TimestampType) TimestampType
           else TimestampNTZType)
    else None
  }
}
