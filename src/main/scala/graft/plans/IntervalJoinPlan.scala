package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Interval (range) join as a first-class plan — the native twin of
  * [[graft.ops.RangeJoin.intervalJoin]]'s bucket-explode composition,
  * mirroring the [[AsOfJoinPlan]] ladder (logical node → strategy →
  * physical merge; SURVEY.md §6 rung (c)).
  *
  * Semantics: INNER join — every (left, right) pair of equal keys with
  * `rightStart <= leftTime <= rightEnd`, SQL `BETWEEN` null semantics
  * (a null time, start, or end matches nothing; null keys never match —
  * enforced by the wrapper's not-null filters, since a raw ordering-based
  * merge would otherwise group null keys together).
  *
  * Physical shape: co-partition both sides on the key, sort left by
  * (key, time) and right by (key, start), then one interval-sweep pass
  * per partition:
  *
  *  - advancing the left cursor admits right rows with `start <= time`
  *    into an ACTIVE set and lazily evicts rows with `end < time`
  *    (monotone in the left time, so each right row is admitted and
  *    evicted at most once);
  *  - every surviving active row matches by construction — the per-row
  *    cost is O(matches + evictions), and memory is bounded by the
  *    maximum number of CONCURRENT intervals per key, not the key's row
  *    count.
  *
  * Trade vs the bucketed composition at 100 TB: this exec never
  * replicates an interval into multiple buckets (no explode fan-out, no
  * `BETWEEN` re-filter discarding most pairs), but it clusters on the
  * key ALONE — one pathologically hot key lands on one task. Keep the
  * bucketed form for skewed key + long-interval corpora; prefer this one
  * when keys are plentiful and intervals moderate.
  */
case class IntervalJoinPlan(left: LogicalPlan, right: LogicalPlan,
                            leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
                            leftTime: Attribute,
                            rightStart: Attribute, rightEnd: Attribute)
  extends BinaryNode {
  require(leftKeys.length == rightKeys.length, "key arity mismatch")
  require(leftTime.dataType == rightStart.dataType &&
    leftTime.dataType == rightEnd.dataType,
    s"interval time types differ: ${leftTime.dataType} vs " +
      s"[${rightStart.dataType}, ${rightEnd.dataType}]")
  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
                                                 newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[IntervalJoinPlan]] into [[IntervalJoinExec]]; inject via
  * `spark.experimental.extraStrategies`.
  */
object IntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalJoinPlan(l, r, lk, rk, lt, rs, re) =>
      IntervalJoinExec(planLater(l), planLater(r), lk, rk, lt, rs, re) :: Nil
    case _ => Nil
  }
}

/** Interval-sweep merge join over co-partitioned children, left sorted by
  * (key, time), right by (key, start). Not codegen'd (branchy cursor and
  * active-set bookkeeping, not expression evaluation).
  */
case class IntervalJoinExec(left: SparkPlan, right: SparkPlan,
                            leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                            leftTime: Expression,
                            rightStart: Expression, rightEnd: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightStart).map(SortOrder(_, Ascending)))

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
    val rStartB = BindReferences.bindReference(rightStart, rightOut)
    val rEndB = BindReferences.bindReference(rightEnd, rightOut)
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeysB, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeysB, rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
        .asInstanceOf[Ordering[Any]]
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(outAttrs, leftOut ++ rightOut)

      // one-row lookahead on the right
      var rHead: InternalRow = null
      var rHeadKey: InternalRow = null
      def advanceRight(): Unit =
        if (rIter.hasNext) {
          rHead = rIter.next().copy() // unsafe rows reuse buffers
          rHeadKey = rKeyProj(rHead).copy()
        } else { rHead = null; rHeadKey = null }
      advanceRight()

      // right rows of the CURRENT left key already admitted (start <= t,
      // end not yet passed); cleared on key change
      val active = new ArrayBuffer[InternalRow]
      var activeKey: InternalRow = null

      lIter.flatMap { lRow =>
        val lKey = lKeyProj(lRow).copy()
        val lTime = lTimeB.eval(lRow)
        if (lTime == null) Iterator.empty // BETWEEN with null: no match
        else {
          if (activeKey == null || keyOrd.compare(activeKey, lKey) != 0) {
            active.clear()
            activeKey = lKey
          }
          // admit right rows of this key whose interval has started
          var continue = rHead != null
          while (continue) {
            val c = keyOrd.compare(rHeadKey, lKey)
            if (c < 0) advanceRight() // right key ordered before lKey
            else if (c == 0) {
              val rs = rStartB.eval(rHead)
              if (rs == null) advanceRight() // null start: never matches
              else if (timeOrd.lteq(rs, lTime)) {
                if (rEndB.eval(rHead) != null) active += rHead // null end: never matches
                advanceRight()
              } else continue = false // starts after t; later lefts may admit
            } else continue = false // right cursor already past this key
            if (rHead == null) continue = false
          }
          // evict expired intervals; every survivor matches (start <= t
          // by admission, end >= t by this filter)
          active.filterInPlace(r => timeOrd.gteq(rEndB.eval(r), lTime))
          // lazy per-match projection: the outer cursor only advances
          // after this inner iterator is drained, so lRow stays valid
          active.iterator.map(r => resultProj(joined(lRow, r)))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
                                                 newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}
