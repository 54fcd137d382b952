package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact n-gram Jaccard similarity between documents.
  *
  * Set intersection/union sizes are computed with explicit
  * filter/contains expressions (not engine `array_intersect` built-ins)
  * so the semantics — distinct-element set ops — are identical on every
  * engine and exactly oracle-checkable.
  */
object Jaccard {

  /** |A ∩ B| over distinct-element arrays. */
  def intersectionSize(a: Column, b: Column): Column =
    size(filter(array_distinct(a), x => array_contains(b, x)))

  /** Jaccard = |A∩B| / |A∪B| over the distinct elements of a and b. */
  def jaccard(a: Column, b: Column): Column = {
    val ad = array_distinct(a)
    val bd = array_distinct(b)
    val inter = size(filter(ad, x => array_contains(bd, x))).cast("double")
    val union = (size(ad) + size(bd)).cast("double") - inter
    when(union > 0, inter / union).otherwise(lit(0.0))
  }

  /** Jaccard over arrays already known to be distinct-element (e.g.
    * [[MinHash.shingles]] output materialized as columns). Skipping the
    * re-distinct matters when the inputs are plain attribute references:
    * the `filter` lambda re-evaluates the captured `b` per element, which
    * is a cheap attribute read here but an array rebuild if wrapped in
    * `array_distinct`.
    */
  def jaccardDistinct(a: Column, b: Column): Column = {
    // array_intersect builds a hash set once per row — O(n) vs the O(n²)
    // per-element `filter`+`array_contains` lambda; identical result for
    // distinct-element inputs.
    val inter = size(array_intersect(a, b)).cast("double")
    val union = (size(a) + size(b)).cast("double") - inter
    when(union > 0, inter / union).otherwise(lit(0.0))
  }

  /** Word n-gram Jaccard between two text columns.
    *
    * NOTE: prefer materializing [[MinHash.shingles]] as real columns
    * before a pairwise compare (shuffle carries the arrays; the compare
    * then reads attributes) — inlining this whole expression into a join
    * output re-evaluates the shingle pipeline per array element.
    */
  def ngramJaccard(textA: Column, textB: Column, n: Int = 3): Column =
    jaccardDistinct(
      MinHash.shingles(TextStats.tokens(textA), n),
      MinHash.shingles(TextStats.tokens(textB), n))
}
