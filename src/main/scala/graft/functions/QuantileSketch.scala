package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types._

/** Mergeable quantile sketches as STORABLE binary columns — the
  * quantile leg of the pre-aggregate cube family
  * ([[graft.ops.Reagg]]: sums merge by sum, distincts by HLL union,
  * quantiles by THIS). Monthly slices store a KB-sized sketch; reports
  * merge sketches and query percentiles without re-scanning facts.
  *
  * The summary structure is Spark's own Greenwald-Khanna variant
  * (`QuantileSummaries`, the engine behind `percentile_approx` /
  * `approxQuantile`): deterministic, mergeable, with rank error
  * ≤ `relativeError` · n — the bound holds across arbitrary
  * merge trees (Greenwald & Khanna, SIGMOD'01).
  *
  * Serialized layout: relativeError, compressThreshold, count,
  * n·(value, g, delta) of the compressed sample array.
  */
object QuantileSketch {

  private[functions] def write(qs: QuantileSummaries): Array[Byte] = {
    val c = qs.compress()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeDouble(c.relativeError)
    out.writeInt(c.compressThreshold)
    out.writeLong(c.count)
    out.writeInt(c.sampled.length)
    c.sampled.foreach { s =>
      out.writeDouble(s.value); out.writeLong(s.g); out.writeLong(s.delta)
    }
    out.flush(); bos.toByteArray
  }

  private[functions] def read(bytes: Array[Byte]): QuantileSummaries = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val relErr = in.readDouble()
    val threshold = in.readInt()
    val count = in.readLong()
    val n = in.readInt()
    val stats = Array.fill(n) {
      new QuantileSummaries.Stats(in.readDouble(), in.readLong(), in.readLong())
    }
    new QuantileSummaries(threshold, relErr, stats, count, true)
  }

  private def empty(relativeError: Double): QuantileSummaries =
    new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold, relativeError)

  /** Shared TypedImperativeAggregate plumbing for the build and merge
    * aggregates (buffer = QuantileSummaries, output = serialized bytes).
    */
  sealed trait SketchAggBase extends TypedImperativeAggregate[QuantileSummaries]
    with UnaryLike[Expression] {
    def relativeError: Double
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def createAggregationBuffer(): QuantileSummaries = empty(relativeError)
    override def merge(a: QuantileSummaries, b: QuantileSummaries): QuantileSummaries =
      if (b.count == 0) a
      else if (a.count == 0) b
      else a.compress().merge(b.compress())
    override def eval(buf: QuantileSummaries): Any = write(buf)
    override def serialize(buf: QuantileSummaries): Array[Byte] = write(buf)
    override def deserialize(bytes: Array[Byte]): QuantileSummaries = read(bytes)
  }

  /** Build a sketch from a DOUBLE value column. */
  case class QuantileSketchAgg(
      child: Expression, relativeError: Double,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0) extends SketchAggBase {
    require(relativeError > 0 && relativeError < 1, s"relativeError=$relativeError")
    override def prettyName: String = "quantile_sketch"
    override def update(buf: QuantileSummaries, input: InternalRow): QuantileSummaries = {
      val v = child.eval(input)
      if (v != null) buf.insert(v.asInstanceOf[Double]) else buf
    }
    override def withNewMutableAggBufferOffset(o: Int): QuantileSketchAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): QuantileSketchAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): QuantileSketchAgg =
      copy(child = c)
  }

  /** Merge pre-built sketches (a BINARY sketch column) to a coarser
    * grain — the quantile twin of `hll_union_agg`.
    */
  case class QuantileSketchMergeAgg(
      child: Expression, relativeError: Double,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0) extends SketchAggBase {
    override def prettyName: String = "quantile_sketch_merge"
    override def update(buf: QuantileSummaries, input: InternalRow): QuantileSummaries = {
      val v = child.eval(input)
      if (v == null) buf
      else merge(buf, read(v.asInstanceOf[Array[Byte]]))
    }
    override def withNewMutableAggBufferOffset(o: Int): QuantileSketchMergeAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): QuantileSketchMergeAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): QuantileSketchMergeAgg =
      copy(child = c)
  }

  /** Read a percentile estimate off a sketch column. Scalar decode —
    * runs once per GROUP row, not per fact row, so `CodegenFallback`
    * costs nothing measurable (same stance as the md5-loop expressions
    * in [[HashExpressions]]).
    */
  case class QuantileSketchQuery(child: Expression, p: Double)
    extends UnaryExpression with CodegenFallback {
    require(p >= 0 && p <= 1, s"p=$p")
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "sketch_quantile"
    protected override def nullSafeEval(bytes: Any): Any = {
      val qs = read(bytes.asInstanceOf[Array[Byte]])
      qs.query(p).map(Double.box).orNull
    }
    override protected def withNewChildInternal(c: Expression): QuantileSketchQuery =
      copy(child = c)
  }

  /** Aggregate Column: GK quantile sketch of a numeric column. */
  def quantileSketch(c: Column, relativeError: Double = 0.01): Column =
    column(QuantileSketchAgg(expression(c.cast("double")), relativeError)
      .toAggregateExpression())

  /** Aggregate Column: merge sketch-typed partials to a coarser grain. */
  def mergeQuantileSketches(c: Column, relativeError: Double = 0.01): Column =
    column(QuantileSketchMergeAgg(expression(c), relativeError)
      .toAggregateExpression())

  /** Percentile estimate off a sketch column (null for empty sketches). */
  def sketchQuantile(sketch: Column, p: Double): Column =
    column(QuantileSketchQuery(expression(sketch), p))
}
