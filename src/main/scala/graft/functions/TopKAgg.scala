package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact top-k per group as a mergeable bounded heap — the third
  * `TypedImperativeAggregate` (SURVEY.md §2.8; pattern of
  * [[MinHashAgg]]/[[HeavyHittersAgg]]).
  *
  * The scale story: the window-function form (`row_number() OVER
  * (PARTITION BY g ORDER BY metric DESC) <= k`) shuffles EVERY input row
  * to its group's partition and sorts there; this aggregate keeps a
  * ≤ k-entry heap per group in the partial (map-side) aggregation, so
  * the shuffle carries at most k entries per group per map partition and
  * no sort ever sees the full stream. At 100 TB that is the difference
  * between shuffling the corpus and shuffling k rows per group per task.
  *
  * Semantics are EXACT (not a sketch): ranking by (metric desc, item
  * asc) — a total order, so results are deterministic and
  * oracle-checkable against the window form. Item ties compare as Java
  * lexicographic string order, which matches SQL VARCHAR comparison for
  * ASCII items (keep oracle-checked items ASCII).
  *
  * Output: array of (item, metric) structs, best-first; `posexplode`
  * for (rank, row) form.
  */
case class TopKAgg(
    left: Expression,   // item: string payload
    right: Expression,  // metric: long ranking key
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, String)]]
  with BinaryLike[Expression] {

  require(k > 0, s"k=$k")

  // analysis-time validation: SQL callers (`top_k(int_col, …)`) must get
  // a resolution error, not a mid-job ClassCastException from update()
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"top_k needs (string item, bigint metric), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("metric", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k"

  /** Heap order: head = WORST retained entry (lowest metric, then
    * largest item), so exceeding k dequeues the element top-k excludes.
    */
  private def worstFirst: Ordering[(Long, String)] =
    Ordering.by[(Long, String), Long](_._1).reverse
      .orElse(Ordering.by[(Long, String), String](_._2))

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, String)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def push(buf: mutable.PriorityQueue[(Long, String)],
                   e: (Long, String)): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else if (worstFirst.compare(e, buf.head) < 0) { buf.dequeue(); buf.enqueue(e) }
  }

  override def update(buf: mutable.PriorityQueue[(Long, String)],
                      input: InternalRow): mutable.PriorityQueue[(Long, String)] = {
    val item = left.eval(input)
    val metric = right.eval(input)
    if (item != null && metric != null)
      push(buf, (metric.asInstanceOf[Long], item.asInstanceOf[UTF8String].toString))
    buf
  }

  override def merge(a: mutable.PriorityQueue[(Long, String)],
                     b: mutable.PriorityQueue[(Long, String)]): mutable.PriorityQueue[(Long, String)] = {
    b.foreach(e => push(a, e))
    a
  }

  override def eval(buf: mutable.PriorityQueue[(Long, String)]): Any = {
    val best = buf.toArray.sortBy { case (m, item) => (-m, item) }
    new GenericArrayData(best.map { case (m, item) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(item), m))
    })
  }

  override def serialize(buf: mutable.PriorityQueue[(Long, String)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (m, item) =>
      val b = item.getBytes("UTF-8")
      out.writeLong(m); out.writeInt(b.length); out.write(b)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, String)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val m = in.readLong()
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      buf.enqueue((m, new String(b, "UTF-8")))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TopKAgg =
    copy(left = l, right = r)
}

object TopKAgg {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Aggregate Column: the k best (item, metric) pairs of the group,
    * ranked (metric desc, item asc), best-first.
    */
  def topK(item: Column, metric: Column, k: Int): Column =
    column(TopKAgg(expression(item), expression(metric), k).toAggregateExpression())
}
