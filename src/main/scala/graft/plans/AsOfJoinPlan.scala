package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of join as a first-class plan: custom logical node + planner
  * strategy + physical merge operator (the (c) rung of the custom-operator
  * ladder, for when composing built-ins isn't enough — SURVEY.md §6).
  *
  * Semantics: left outer as-of — every left row picks up the LATEST right
  * row of the same key with `rightTime <= leftTime`, or nulls. Identical
  * result to [[graft.ops.AsOf.asofJoin]]'s union+LOCF-window composition
  * (asserted in spec and by sharing its DuckDB `ASOF LEFT JOIN` oracle),
  * but executed as a single streaming merge pass:
  *
  *  - `requiredChildDistribution` co-partitions both sides on the key —
  *    the SAME one-shuffle cost as the composed form's window;
  *  - `requiredChildOrdering` sorts each side by (key, time) — Spark
  *    plans the sorts, AQE still applies;
  *  - `doExecute` zips co-partitions and merges with one cursor per side
  *    and O(1) carried state (the newest right row ≤ current left time) —
  *    no union materialization, no window buffer, no null-fill columns.
  *
  * At 100 TB both shapes scale; the exec form halves the shuffled bytes
  * (the composed form unions right columns onto every left row BEFORE the
  * shuffle) and never holds more than two rows per side in memory.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
                        leftTime: Attribute, rightTime: Attribute)
  extends BinaryNode {
  require(leftKeys.length == rightKeys.length, "key arity mismatch")
  require(leftTime.dataType == rightTime.dataType,
    s"as-of time types differ: ${leftTime.dataType} vs ${rightTime.dataType}")
  // right side is outer: its attributes become nullable in the output
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
                                                 newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] into [[AsOfJoinExec]]; inject via
  * `spark.experimental.extraStrategies` or [[graft.GraftExtensions]].
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** Streaming merge as-of join over co-partitioned, (key, time)-sorted
  * children. Not codegen'd (a bespoke two-cursor merge; the per-row work
  * is branchy pointer advancement, not expression evaluation).
  */
case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTime: Expression, rightTime: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val leftOut = left.output
    val rightOut = right.output
    val lKeysB = leftKeys
    val rKeysB = rightKeys
    val lTimeB = BindReferences.bindReference(leftTime, leftOut)
    val rTimeB = BindReferences.bindReference(rightTime, rightOut)
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeysB, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeysB, rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
      val nullRight = new GenericInternalRow(rightOut.length)
      val joined = new JoinedRow
      // bind against a NULLABLE right schema: the outer side emits null
      // rows, and a non-nullable BoundReference would skip the null check
      val resultProj = UnsafeProjection.create(outAttrs,
        leftOut ++ rightOut.map(_.withNullability(true)))

      // one-row lookahead on the right; carried newest-match per key
      var rHead: InternalRow = null
      var rHeadKey: InternalRow = null
      var carried: InternalRow = null
      var carriedKey: InternalRow = null
      def advanceRight(): Unit =
        if (rIter.hasNext) {
          rHead = rIter.next().copy() // unsafe rows reuse buffers
          rHeadKey = rKeyProj(rHead).copy()
        } else { rHead = null; rHeadKey = null }
      advanceRight()

      lIter.map { lRowRaw =>
        val lRow = lRowRaw
        val lKey = lKeyProj(lRow).copy()
        val lTime = lTimeB.eval(lRow)
        // consume right rows that are now at-or-before this left position
        var continue = rHead != null
        while (continue) {
          val c = keyOrd.compare(rHeadKey, lKey)
          if (c < 0) {
            advanceRight() // right key exhausted before reaching lKey
          } else if (c == 0 && {
            val rt = rTimeB.eval(rHead)
            // a null right time sorts NULLS FIRST under the required
            // ascending ordering, i.e. "infinitely early": it is ≤ every
            // left time (and ≤ a null left time) — carry it, exactly as
            // the composed form's last(ignoreNulls) window does. Stopping
            // here instead would stall the cursor on the null-time row
            // and silently drop all later matches for this key.
            rt == null ||
              (lTime != null && timeOrd.asInstanceOf[Ordering[Any]].lteq(rt, lTime))
          }) {
            carried = rHead // newest right row ≤ lTime for this key
            carriedKey = rHeadKey
            advanceRight()
          } else continue = false
          if (rHead == null) continue = false
        }
        val matched = carried != null && keyOrd.compare(carriedKey, lKey) == 0
        resultProj(joined(lRow, if (matched) carried else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
                                                 newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}
