package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve key: the distance along the order-31 Hilbert curve of
  * a 2-D point — the higher-quality sibling of [[ZOrderKey]] for
  * clustered file layouts. The Morton curve takes long diagonal jumps
  * at power-of-two boundaries, so a file of consecutive z-keys can
  * still straddle two far-apart spatial blocks and carry wide min-max
  * ranges; the Hilbert curve moves to an ADJACENT cell at every step
  * (proven in `HilbertSpec`), so consecutive-key files are spatially
  * tight and parquet min-max pruning discards more of them. This is why
  * lakehouse formats added `OPTIMIZE ... BY HILBERT` alongside Z-order.
  *
  * Contract: inputs are longs in [0, 2^31); the key is in [0, 2^62) so
  * signed-long ordering IS curve order (same envelope as [[ZOrderKey]]).
  * Negative/oversized inputs throw rather than aliasing distant keys.
  *
  * Per row it is 31 iterations of shift/mask/xor plus a conditional
  * reflect-swap (the classic Warren/Wikipedia xy2d loop) — branch-light
  * integer work that implements `doGenCode` and stays inside
  * whole-stage codegen. [[HilbertKey.StageShifts]] exposes the per-bit
  * schedule so SQL oracles replay the identical loop as one generated
  * CTE per bit (the [[ZOrderKey.SpreadStages]] discipline).
  */
case class HilbertKey(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_key needs (bigint, bigint), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_key"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    HilbertKey.index(a.asInstanceOf[Long], b.asInstanceOf[Long])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HilbertKey$$.MODULE$$.index($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object HilbertKey {

  /** Bits per dimension: 31 → keys in [0, 2^62), non-negative. */
  val Order: Int = 31

  /** The per-iteration bit positions, highest first — the shared
    * schedule between [[index]] and generated SQL twins.
    */
  val StageShifts: Seq[Int] = (Order - 1) to 0 by -1

  /** Hilbert d-index of (x, y) on the order-31 curve (the standard
    * xy2d: per bit, accumulate the quadrant's arc length s²·(3·rx ⊕ ry)
    * then reflect/rotate the frame for the next level).
    */
  def index(x0: Long, y0: Long): Long = {
    if (x0 < 0 || y0 < 0 || x0 > 0x7FFFFFFFL || y0 > 0x7FFFFFFFL)
      throw new IllegalArgumentException(
        s"hilbert_key inputs must be in [0, 2^31), got ($x0, $y0)")
    var x = x0
    var y = y0
    var d = 0L
    var i = Order - 1
    while (i >= 0) {
      val s = 1L << i
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        val (nx, ny) =
          if (rx == 1L) (s - 1L - y, s - 1L - x) else (y, x)
        x = nx
        y = ny
      }
      i -= 1
    }
    d
  }

  /** Column-API entry point; inputs are cast to long. */
  def hilbertKey(a: Column, b: Column): Column =
    ColumnBridge.column(HilbertKey(
      ColumnBridge.expression(a.cast("long")),
      ColumnBridge.expression(b.cast("long"))))
}
