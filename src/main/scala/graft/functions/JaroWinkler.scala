package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity as a native codegen'd expression — the
  * string-distance workhorse of probabilistic record linkage (names and
  * short identifiers, where Levenshtein over-penalizes transpositions:
  * "MARTHA"/"MARHTA" scores 0.961 here vs an edit-ratio of 0.67).
  * Complements the built-in `levenshtein` in the [[graft.ops.Linkage]]
  * comparison vector.
  *
  * Classic Winkler variant, matching the common engine implementations
  * (including the DuckDB twin's `jaro_winkler_similarity`, verified in
  * `JaroWinklerSpec`): match window `max(|a|,|b|)/2 − 1`, transpositions
  * from matched-sequence order, prefix bonus `ℓ·0.1·(1−jaro)` with
  * ℓ ≤ 4 applied only when jaro > 0.7, and 0.0 when either side is
  * empty (INCLUDING both-empty — the linkage convention: no evidence,
  * not perfect agreement).
  *
  * O(|a|·|b|) worst case per pair with small constants (two boolean
  * arrays, no allocation-per-char) — for use AFTER candidate
  * generation (SNM blocks, LSH buckets), never as a corpus cross-join
  * score.
  */
case class JaroWinklerSim(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler needs string inputs, got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerSim.similarity(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = JaroWinklerSim.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $cls.similarity($a.toString(), $b.toString());")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerSim {

  /** Scalar Jaro-Winkler (see class doc for the exact variant). */
  def similarity(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    if (a == b) return 1.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val matchedA = new Array[Boolean](la)
    val matchedB = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!matchedB(j) && a.charAt(i) == b.charAt(j)) {
          matchedA(i) = true; matchedB(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk the two matched subsequences in order
    var t = 0
    var j = 0
    i = 0
    while (i < la) {
      if (matchedA(i)) {
        while (!matchedB(j)) j += 1
        if (a.charAt(i) != b.charAt(j)) t += 1
        j += 1
      }
      i += 1
    }
    // floored half-transpositions — the rapidfuzz/DuckDB convention
    // (fuzz-verified bit-exact against the twin over 40k random pairs)
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t / 2) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    while (prefix < math.min(4, math.min(la, lb)) &&
      a.charAt(prefix) == b.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }

  /** Column-API entry point. */
  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.column(
      JaroWinklerSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
