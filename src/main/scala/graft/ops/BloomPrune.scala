package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.BinaryType

/** Semi-join reduction with a bloom filter: build a bloom over the
  * (already filtered, selective) build side's join keys and pre-filter
  * the probe side BEFORE its shuffle, so the exchange moves only rows
  * that can possibly join. At 100 TB the probe side of a selective join
  * is the dominant shuffle; a ~MB bloom cuts it to the matching subset
  * plus the false-positive rate.
  *
  * Correctness: a bloom has false POSITIVES only, and the join that
  * follows removes them — results are exactly the plain join's (the
  * oracle proves it). Restricted to `inner`/`left_semi`, where dropping
  * non-matching probe rows early is semantics-preserving.
  *
  * Catalyst already injects this shape automatically inside one query
  * when `spark.sql.optimizer.runtime.bloomFilter.enabled` is on; this
  * operator is the EXPLICIT form for when the optimizer can't see it —
  * reusing one filter across several queries, or pruning against a
  * precomputed key list.
  *
  * The bloom itself is collected to the driver as one binary scalar and
  * embedded as a literal — the same bytes a broadcast would move, and a
  * foldable bloom expression keeps `might_contain` inside whole-stage
  * codegen (Spark's own runtime filter does the same via a scalar
  * subquery). Both sides hash with `xxhash64` (seed 42), matching
  * Spark's injected filters.
  */
object BloomPrune {

  /** Bloom filter bytes over `build`'s `keyCol`, sized for
    * `expectedItems` at false-positive rate `fpp`.
    */
  def bloomBytes(build: DataFrame, keyCol: String,
                 expectedItems: Long, fpp: Double): Array[Byte] = {
    require(expectedItems > 0, s"expectedItems=$expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp=$fpp")
    val numBits = math.max(64L,
      math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(expression(col(keyCol)))),
      Literal(expectedItems), Literal(numBits), 0, 0).toAggregateExpression()
    build.agg(column(agg).as("bloom")).head().getAs[Array[Byte]](0)
  }

  /** `might_contain(bloom, xxhash64(key))` as a codegen'd predicate. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(expression(key)))))

  /** `probe ⋈ build` with the probe side bloom-pruned before its
    * shuffle. Exactly the plain join's rows (false positives die in the
    * join); only `inner` and `left_semi` are accepted.
    */
  def bloomPrunedJoin(probe: DataFrame, build: DataFrame,
                      probeKey: String, buildKey: String,
                      joinType: String = "inner",
                      expectedItems: Long = 1000000L,
                      fpp: Double = 0.03): DataFrame = {
    require(Set("inner", "left_semi", "leftsemi", "semi")(joinType.toLowerCase),
      s"bloom pruning drops probe rows early; '$joinType' would change results")
    val bloom = bloomBytes(build, buildKey, expectedItems, fpp)
    val pruned = probe.where(mightContain(bloom, col(probeKey)))
    // alias the frames so probeKey == buildKey (the common case: joining
    // on the same column name) resolves unambiguously instead of failing
    // analysis — same __r_ discipline as Merge/RangeJoin
    val pa = pruned.alias("__bp_l")
    val ba = build.alias("__bp_r")
    val joined = pa.join(ba,
      col(s"__bp_l.$probeKey") === col(s"__bp_r.$buildKey"), joinType)
    // left_semi keeps only probe columns, so no duplicate names survive;
    // inner with identical key names keeps both sides' columns, exactly
    // like the plain join it documents itself as
    joined
  }
}
