package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Heavy hitters (frequent items) as a mergeable Misra-Gries summary —
  * the second `TypedImperativeAggregate` sketch (SURVEY.md §2.8,
  * pattern established by [[MinHashAgg]]). The LLM-pipeline use: hot
  * vocabulary / hot shingle detection over a corpus without a full
  * (token, count) shuffle — the shuffle carries at most `capacity`
  * counters per group, not the token stream.
  *
  * Guarantees (Misra-Gries; merge per Agarwal et al., "Mergeable
  * Summaries", PODS'12):
  *  - every stored estimate UNDERCOUNTS: `true - N/(capacity+1) ≤ est ≤
  *    true` for any item (N = stream length), across arbitrary
  *    partial-aggregate merge trees;
  *  - any item with true frequency > N/(capacity+1) is present;
  *  - with `capacity ≥` the number of distinct items the summary is
  *    EXACT (no decrement ever fires) — which is what the oracle query
  *    checks hash-exactly against a plain GROUP BY count.
  *
  * Output: array of (item, est_count) structs, (est_count desc, item
  * asc) — a deterministic total order.
  */
case class HeavyHittersAgg(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] with UnaryLike[Expression] {

  require(capacity > 0, s"capacity=$capacity")

  // analysis-time validation: SQL callers (`heavy_hitters(bigint_col, …)`)
  // must get a resolution error, not a mid-job ClassCastException
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"heavy_hitters needs a string item column, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est_count", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "heavy_hitters"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  /** Classic MG step: resident key increments; a miss at capacity
    * decrements EVERY counter (each miss pays one unit on `capacity`
    * counters — the source of the N/(capacity+1) bound).
    */
  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None if buf.size < capacity => buf.update(key, 1L)
        case None => decrementAll(buf, 1L)
      }
    }
    buf
  }

  /** Mergeable-summaries merge: pointwise counter sum, then subtract the
    * (capacity+1)-th largest value so at most `capacity` survive — the
    * error bounds compose additively.
    */
  override def merge(a: mutable.HashMap[String, Long],
                     b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > capacity) {
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      decrementAll(a, counts(counts.length - capacity - 1))
    }
    a
  }

  private def decrementAll(buf: mutable.HashMap[String, Long], by: Long): Unit = {
    val dead = mutable.ArrayBuffer.empty[String]
    buf.foreach { case (k, c) =>
      if (c <= by) dead += k else buf.update(k, c - by)
    }
    dead.foreach(buf.remove)
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (item, c) => (-c, item) }
    new GenericArrayData(sorted.map { case (item, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(item), c))
    })
  }

  // length-prefixed UTF-8, not writeUTF: items are usually tokens, but a
  // caller aggregating whole documents must not hit writeUTF's 64 KB cap
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val b = k.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): HeavyHittersAgg =
    copy(child = c)
}

object HeavyHittersAgg {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Aggregate Column: Misra-Gries frequent-items summary of a string
    * column, at most `capacity` (item, est_count) entries.
    */
  def heavyHitters(item: Column, capacity: Int): Column =
    column(HeavyHittersAgg(expression(item), capacity).toAggregateExpression())
}
