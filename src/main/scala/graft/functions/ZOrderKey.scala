package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) key: bit-interleave of two non-negative dimension
  * keys into one long, so that sorting by the single key clusters rows
  * that are close in BOTH dimensions.
  *
  * Why this matters at 100 TB: parquet scans prune on per-file/row-group
  * min-max statistics, but a layout sorted by one column has useless
  * ranges on every other column — a predicate on the second dimension
  * reads the whole table. Writing files clustered by the z-key
  * ([[graft.sinks.ZOrder]]) gives every file a tight range on BOTH
  * dimensions, so two-dimensional predicates prune files (the
  * `OPTIMIZE ZORDER BY` pattern of lakehouse table formats, built from
  * a plain expression + range partitioning).
  *
  * Contract: inputs are longs in [0, 2^31): 31 bits per dimension
  * interleave into a 62-bit non-negative key (a-bits at even positions),
  * so signed-long ordering IS z-order. Negative inputs throw — silently
  * masking them would alias distant keys into the same neighborhood and
  * quietly destroy locality.
  *
  * Cheap per row (12 shift/mask ops), so it implements `doGenCode` and
  * stays inside whole-stage codegen, like [[RegexpCount]].
  */
case class ZOrderKey(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder_key needs (bigint, bigint), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_key"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderKey.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrderKey$$.MODULE$$.interleave($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Three-dimension Morton key: 21 bits per dimension interleaved into a
  * 63-bit non-negative long (a at bit 0 mod 3, b at 1, c at 2). Same
  * layout use as [[ZOrderKey]] for triple-key scan patterns, e.g.
  * (date-bucket, part, supplier). Inputs in [0, 2^21) — coarser than the
  * 2-D key's 2^31, the price of a third dimension in 64 bits; bucket
  * wider domains first.
  */
case class ZOrderKey3(first: Expression, second: Expression, third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(first, second, third).forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder_key3 needs (bigint, bigint, bigint), got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType})")
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_key3"

  protected override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    ZOrderKey.interleave3(a.asInstanceOf[Long], b.asInstanceOf[Long],
      c.asInstanceOf[Long])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) =>
      s"${ev.value} = graft.functions.ZOrderKey$$.MODULE$$.interleave3($a, $b, $c);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object ZOrderKey {

  /** Spread the low 31 bits of `x` to even bit positions (the classic
    * magic-number dilation).
    */
  def spread(x: Long): Long = {
    var v = x & 0x7FFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Morton interleave of two keys in [0, 2^31): a on even bits, b on
    * odd bits.
    */
  def interleave(a: Long, b: Long): Long = {
    if (a < 0 || b < 0 || a > 0x7FFFFFFFL || b > 0x7FFFFFFFL)
      throw new IllegalArgumentException(
        s"zorder_key inputs must be in [0, 2^31), got ($a, $b)")
    spread(a) | (spread(b) << 1)
  }

  /** Column-API entry point; inputs are cast to long. */
  def zorderKey(a: Column, b: Column): Column =
    ColumnBridge.column(ZOrderKey(
      ColumnBridge.expression(a.cast("long")),
      ColumnBridge.expression(b.cast("long"))))

  /** The dilation (shift, mask) stages, exposed so SQL oracles can
    * mirror [[spread]] as staged CTE columns (one stage per CTE — a
    * single nested expression would duplicate its input 2^5 times).
    */
  val SpreadStages: Seq[(Int, Long)] = Seq(
    (16, 0x0000FFFF0000FFFFL), (8, 0x00FF00FF00FF00FFL),
    (4, 0x0F0F0F0F0F0F0F0FL), (2, 0x3333333333333333L),
    (1, 0x5555555555555555L))

  /** Spread the low 21 bits of `x` to every third bit position (the
    * standard 3-D Morton dilation constants).
    */
  def spread3(x: Long): Long = {
    var v = x & 0x1FFFFFL
    v = (v | (v << 32)) & 0x1F00000000FFFFL
    v = (v | (v << 16)) & 0x1F0000FF0000FFL
    v = (v | (v << 8)) & 0x100F00F00F00F00FL
    v = (v | (v << 4)) & 0x10C30C30C30C30C3L
    v = (v | (v << 2)) & 0x1249249249249249L
    v
  }

  /** Morton interleave of three keys in [0, 2^21). */
  def interleave3(a: Long, b: Long, c: Long): Long = {
    if (a < 0 || b < 0 || c < 0 ||
        a > 0x1FFFFFL || b > 0x1FFFFFL || c > 0x1FFFFFL)
      throw new IllegalArgumentException(
        s"zorder_key3 inputs must be in [0, 2^21), got ($a, $b, $c)")
    spread3(a) | (spread3(b) << 1) | (spread3(c) << 2)
  }

  /** Column-API entry point for the 3-D key; inputs are cast to long. */
  def zorderKey3(a: Column, b: Column, c: Column): Column =
    ColumnBridge.column(ZOrderKey3(
      ColumnBridge.expression(a.cast("long")),
      ColumnBridge.expression(b.cast("long")),
      ColumnBridge.expression(c.cast("long"))))
}
