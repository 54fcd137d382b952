package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.HashExpressions.{CosineSim, MinHashSigs, SimHash32, WordNgrams}
import graft.functions.RegexpCount

/** SQL registration of the native expressions, so `spark.sql` users get
  * the same operators as the Column API:
  *
  *   SELECT simhash32(tokens), minhash_sigs(shingles, 8),
  *          word_ngrams(tokens, 3), cosine_sim(a, b)
  *
  * Either call [[GraftFunctions.register]] on a session, or configure
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case _ => throw new IllegalArgumentException(s"$what must be an integer literal")
  }

  /** A clean arity error instead of the IndexOutOfBounds a direct
    * `es(n)` access would throw at resolution time.
    */
  private def arity(es: Seq[Expression], n: Int, name: String): Seq[Expression] = {
    if (es.length != n)
      throw new IllegalArgumentException(
        s"$name expects $n arguments, got ${es.length}")
    es
  }

  private def strLit(e: Expression, what: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
    case _ => throw new IllegalArgumentException(s"$what must be a string literal")
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "simhash32" -> { es =>
      SimHash32(arity(es, 1, "simhash32").head) },
    "minhash_sigs" -> { es =>
      arity(es, 2, "minhash_sigs"); MinHashSigs(es.head, intLit(es(1), "k")) },
    "word_ngrams" -> { es =>
      arity(es, 2, "word_ngrams"); WordNgrams(es.head, intLit(es(1), "n")) },
    "cosine_sim" -> { es =>
      arity(es, 2, "cosine_sim"); CosineSim(es.head, es(1)) },
    "regexp_count" -> { es =>
      arity(es, 2, "regexp_count")
      RegexpCount(es.head, strLit(es(1), "pattern")) },
    "zorder_key" -> { es =>
      arity(es, 2, "zorder_key"); graft.functions.ZOrderKey(es.head, es(1)) },
    "zorder_key3" -> { es =>
      arity(es, 3, "zorder_key3")
      graft.functions.ZOrderKey3(es.head, es(1), es(2)) },
    "hilbert_key" -> { es =>
      arity(es, 2, "hilbert_key"); graft.functions.HilbertKey(es.head, es(1)) },
    // aggregates: the analyzer wraps a bare AggregateFunction builder
    // result in an AggregateExpression during function resolution
    "top_k" -> { es =>
      arity(es, 3, "top_k")
      graft.functions.TopKAgg(es.head, es(1), intLit(es(2), "k")) },
    "heavy_hitters" -> { es =>
      arity(es, 2, "heavy_hitters")
      graft.functions.HeavyHittersAgg(es.head, intLit(es(1), "capacity")) },
    "normalize_unicode" -> { es =>
      arity(es, 2, "normalize_unicode")
      graft.functions.NormalizeUnicode(es.head, strLit(es(1), "form")) },
    "count_min" -> { es =>
      arity(es, 3, "count_min")
      graft.functions.CountMinAgg(es.head,
        intLit(es(1), "width"), intLit(es(2), "depth")) },
    "count_min_estimate" -> { es =>
      arity(es, 4, "count_min_estimate")
      graft.functions.CmsEstimate(es.head, es(1),
        intLit(es(2), "width"), intLit(es(3), "depth")) },
    "count_min_join_size" -> { es =>
      arity(es, 4, "count_min_join_size")
      graft.functions.CmsJoinSize(es.head, es(1),
        intLit(es(2), "width"), intLit(es(3), "depth")) })

  /** Imperative registration on an existing session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

/** `spark.sql.extensions` entry point registering the graft functions at
  * session build time.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectPlannerStrategy(_ => graft.plans.IntervalJoinStrategy)
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.HashExpressions", name),
        builder))
    }
  }
}
