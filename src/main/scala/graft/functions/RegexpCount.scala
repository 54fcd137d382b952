package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of non-overlapping regex matches in a string — semantically
  * `size(regexp_extract_all(s, pattern))`, without materializing the
  * match array (at corpus scale that array exists only to be counted and
  * immediately discarded: one allocation per match per row).
  *
  * Unlike the md5-loop expressions in [[HashExpressions]] (CodegenFallback
  * by design — digest work dwarfs dispatch), counting matches is cheap
  * enough per row that staying inside whole-stage codegen matters, so
  * this one implements `doGenCode`: the compiled [[Pattern]] is shared
  * via a reference object and the generated code is a bare matcher loop.
  *
  * The pattern must be a compile-time constant (the common case for
  * quality stats; a per-row pattern would force per-row compilation).
  */
case class RegexpCount(child: Expression, pattern: String)
  extends UnaryExpression {

  @transient private lazy val compiled: Pattern = Pattern.compile(pattern)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"regexp_count needs a string input, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "regexp_count"

  protected override def nullSafeEval(input: Any): Any = {
    val m = compiled.matcher(input.asInstanceOf[UTF8String].toString)
    var n = 0L
    while (m.find()) n += 1
    n
  }

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patternRef = ctx.addReferenceObj("pattern", compiled,
      classOf[Pattern].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val m = ctx.freshName("matcher")
      val n = ctx.freshName("count")
      s"""
         |java.util.regex.Matcher $m = $patternRef.matcher($c.toString());
         |long $n = 0L;
         |while ($m.find()) $n++;
         |${ev.value} = $n;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RegexpCount {
  /** Column-API entry point; `pattern` is a Java-regex string literal. */
  def regexpCount(c: Column, pattern: String): Column =
    ColumnBridge.column(RegexpCount(ColumnBridge.expression(c), pattern))
}
