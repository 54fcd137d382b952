package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native expression —
  * the canonicalization step exact-dup detection needs BEFORE hashing:
  * "café" composed (U+00E9) and decomposed (e + U+0301) are the same
  * text to a reader but different bytes to `md5`, so an unnormalized
  * fingerprint silently splits duplicates ([[graft.llm.TextStats
  * .normalizedText]] handles case/whitespace; this closes the encoding
  * axis). Spark ships no normalizer builtin; a Scala UDF would lose
  * codegen and null pruning — this stays a `UnaryExpression` with
  * `doGenCode` (the JDK normalizer call dominates, but dispatch,
  * null-handling, and UTF8String round-trips stay inside the generated
  * plan, same rationale as [[RegexpCount]]).
  *
  * The fast path matters at corpus scale: `Normalizer.isNormalized` is
  * a cheap scan that succeeds for effectively-ASCII corpora, skipping
  * the allocation-heavy normalize call on already-normal strings.
  */
case class NormalizeUnicode(child: Expression, form: String)
  extends UnaryExpression {

  @transient private lazy val normForm: Normalizer.Form =
    Normalizer.Form.valueOf(form)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"normalize_unicode needs a string input, got ${child.dataType}")
    else if (!Set("NFC", "NFD", "NFKC", "NFKD").contains(form))
      TypeCheckResult.TypeCheckFailure(
        s"normalize_unicode form must be NFC/NFD/NFKC/NFKD, got $form")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_unicode"

  protected override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (Normalizer.isNormalized(s, normForm)) input
    else UTF8String.fromString(Normalizer.normalize(s, normForm))
  }

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formRef = ctx.addReferenceObj("form", normForm,
      classOf[Normalizer.Form].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("str")
      s"""
         |String $s = $c.toString();
         |${ev.value} = java.text.Normalizer.isNormalized($s, $formRef)
         |  ? $c
         |  : org.apache.spark.unsafe.types.UTF8String.fromString(
         |      java.text.Normalizer.normalize($s, $formRef));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeUnicode {
  /** Column-API entry point; `form` ∈ NFC | NFD | NFKC | NFKD. */
  def normalizeUnicode(c: Column, form: String = "NFC"): Column =
    ColumnBridge.column(NormalizeUnicode(ColumnBridge.expression(c), form))
}
