package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch as a mergeable `TypedImperativeAggregate` — the
  * third sketch family next to [[MinHashAgg]] (similarity) and
  * [[HeavyHittersAgg]] (top frequencies): point-frequency ESTIMATES for
  * ANY item after one pass, in `depth × width` longs. At corpus scale
  * the shuffle carries one fixed-size counter grid per map partition
  * instead of the item stream, and the grid merges by elementwise sum —
  * associative, so arbitrary partial-aggregate merge trees give the
  * SAME sketch as a single sequential pass (spec-proven).
  *
  * Guarantees (Cormode & Muthukrishnan, J.Alg 2005):
  *  - estimates NEVER undercount (counters only ever add);
  *  - `est ≤ true + ε·N` with probability ≥ 1−δ per item, where
  *    `ε = e/width`, `δ = e^-depth`, N = stream length.
  * [[HeavyHittersAgg]] is the dual (undercount, stores items); CMS
  * stores no items, so it answers points the MG summary evicted.
  *
  * Row hashes are `xxhash64(item, seed = row)` — the engine's own
  * stable hash, so sketches built on different clusters/versions of
  * this library are merge-compatible.
  */
case class CountMinAgg(
    child: Expression,
    width: Int,
    depth: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(width > 0, s"width=$width")
  require(depth > 0, s"depth=$depth")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"count_min needs a string item column, got ${child.dataType.simpleString}")

  /** Row-major `depth × width` counter grid. */
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "count_min"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String]
      var r = 0
      while (r < depth) {
        buf(r * width + CountMinAgg.cell(item, r, width)) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(buf.length * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](depth * width)
    var i = 0
    while (i < buf.length) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): CountMinAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CountMinAgg =
    copy(child = c)
}

object CountMinAgg {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Row `r`'s cell for `item`: xxhash64 with seed r, floor-mod width. */
  private[functions] def cell(item: UTF8String, r: Int, width: Int): Int =
    java.lang.Math.floorMod(
      XxHash64Function.hash(item, StringType, r.toLong), width.toLong).toInt

  /** Aggregate Column: `depth × width` count-min grid over a string
    * column, queryable with [[CmsEstimate.cmsEstimate]].
    */
  def countMinSketch(item: Column, width: Int, depth: Int): Column =
    column(CountMinAgg(expression(item), width, depth).toAggregateExpression())
}

/** Point lookup into a [[CountMinAgg]] grid: min over the `depth` row
  * counters the item hashes to. Never undercounts; see [[CountMinAgg]]
  * for the overcount envelope. (CodegenFallback: `depth` hash calls per
  * row, and lookups run over distinct-item frames orders of magnitude
  * smaller than the streams the sketch summarizes.)
  */
case class CmsEstimate(sketch: Expression, item: Expression,
                       width: Int, depth: Int)
  extends BinaryExpression with CodegenFallback {

  require(width > 0, s"width=$width")
  require(depth > 0, s"depth=$depth")

  override def left: Expression = sketch
  override def right: Expression = item

  override def checkInputDataTypes(): TypeCheckResult = sketch.dataType match {
    case ArrayType(LongType, _) if item.dataType == StringType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "count_min_estimate needs (array<bigint> sketch, string item), got " +
        s"(${sketch.dataType.simpleString}, ${item.dataType.simpleString})")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "count_min_estimate"

  protected override def nullSafeEval(sk: Any, it: Any): Any = {
    val arr = sk.asInstanceOf[ArrayData]
    // a grid built with different (width, depth) reads as a DIFFERENT
    // layout — lookups could silently UNDERCOUNT, violating the one
    // guarantee this sketch has; fail loudly instead
    if (arr.numElements() != width * depth)
      throw new IllegalArgumentException(
        s"count_min_estimate(width=$width, depth=$depth) expects a " +
          s"${width * depth}-cell sketch, got ${arr.numElements()} — " +
          "width/depth must match the sketch's build parameters")
    val s = it.asInstanceOf[UTF8String]
    var min = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = arr.getLong(r * width + CountMinAgg.cell(s, r, width))
      if (c < min) min = c
      r += 1
    }
    min
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(sketch = newLeft, item = newRight)
}

object CmsEstimate {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Estimated frequency of `item` in the stream `sketch` summarized —
    * `width`/`depth` must match the sketch's build parameters.
    */
  def cmsEstimate(sketch: Column, item: Column, width: Int, depth: Int): Column =
    column(CmsEstimate(expression(sketch), expression(item), width, depth))
}

/** Equi-join SIZE estimate from two [[CountMinAgg]] grids built with
  * the SAME (width, depth) over each side's join key: min over rows of
  * the counter inner product (Alon-Gibbons-Matias-Szegedy via CMS;
  * Cormode & Muthukrishnan §4.2). NEVER undercounts; overcounts by at
  * most `ε·N_a·N_b` (ε = e/width) — cross-terms shrink with width, so
  * useful tightness wants `width ≳` the distinct-key count. This is
  * the broadcast-or-shuffle planning question ("how big is this join?")
  * answered from two KB–MB sketches without running the join.
  */
case class CmsJoinSize(a: Expression, b: Expression, width: Int, depth: Int)
  extends BinaryExpression with CodegenFallback {

  require(width > 0, s"width=$width")
  require(depth > 0, s"depth=$depth")

  override def left: Expression = a
  override def right: Expression = b

  override def checkInputDataTypes(): TypeCheckResult = (a.dataType, b.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "count_min_join_size needs two array<bigint> sketches, got " +
        s"(${a.dataType.simpleString}, ${b.dataType.simpleString})")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "count_min_join_size"

  protected override def nullSafeEval(sa: Any, sb: Any): Any = {
    val va = sa.asInstanceOf[ArrayData]
    val vb = sb.asInstanceOf[ArrayData]
    val n = width * depth
    if (va.numElements() != n || vb.numElements() != n)
      throw new IllegalArgumentException(
        s"count_min_join_size(width=$width, depth=$depth) expects two " +
          s"$n-cell sketches, got ${va.numElements()} and " +
          s"${vb.numElements()} — both must be built with these parameters")
    var min = Long.MaxValue
    var r = 0
    while (r < depth) {
      var dot = 0L
      var c = 0
      while (c < width) {
        val i = r * width + c
        dot += va.getLong(i) * vb.getLong(i)
        c += 1
      }
      if (dot < min) min = dot
      r += 1
    }
    min
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(a = newLeft, b = newRight)
}

object CmsJoinSize {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Estimated equi-join row count between the streams the two sketches
    * summarize; both must be built with this `width`/`depth`.
    */
  def cmsJoinSize(a: Column, b: Column, width: Int, depth: Int): Column =
    column(CmsJoinSize(expression(a), expression(b), width, depth))
}
