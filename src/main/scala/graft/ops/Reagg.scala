package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental re-aggregation: coarsen a PRE-AGGREGATE instead of
  * re-scanning the facts. At 100 TB the monthly rollup is produced
  * incrementally month by month ([[graft.sinks.Idempotent]] slices);
  * quarterly/yearly reports then aggregate the rollup — KBs per
  * group — not the fact table. Correct only for MERGEABLE measures,
  * which is why the contract is explicit here: sums and counts merge by
  * sum (a count IS a sum of partial counts), mins by min, maxes by max.
  * Non-mergeable aggregates must be carried as mergeable parts: avg as
  * (sum, count), distinct counts as a sketch
  * (e.g. [[graft.functions.MinHashAgg]]-style digests or HLL).
  */
object Reagg {

  /** Merge `pre` (a finer-grain pre-aggregate) up to the grain of
    * `keys`. Measure columns keep their names, so a coarsening chain
    * (day → month → quarter → year) composes.
    */
  def coarsen(pre: DataFrame, keys: Seq[Column],
              sums: Seq[String] = Nil, mins: Seq[String] = Nil,
              maxs: Seq[String] = Nil): DataFrame = {
    val aggs = sums.map(c => sum(col(c)).as(c)) ++
      mins.map(c => min(col(c)).as(c)) ++
      maxs.map(c => max(col(c)).as(c))
    require(aggs.nonEmpty, "no mergeable measures given")
    pre.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** The mergeable form of COUNT(DISTINCT): a Datasketches HLL sketch
    * column. Store one per pre-aggregate group; coarser grains merge
    * sketches ([[mergeDistinctSketches]]) instead of re-scanning — the
    * only way a 100 TB layout answers distinct-count questions at
    * report time. HLL bucket state is order-insensitive (per-bucket
    * max), so merging per-slice sketches estimates IDENTICALLY to one
    * sketch over the union — proven in the spec, not just within-ε.
    */
  def distinctSketch(c: Column, lgK: Int = 12): Column =
    hll_sketch_agg(c, lit(lgK))

  /** Merge sketch-typed partials (e.g. monthly) to a coarser grain. */
  def mergeDistinctSketches(c: Column): Column =
    hll_union_agg(c, lit(false))

  /** Read a distinct-count estimate off a sketch column. */
  def estimateDistinct(c: Column): Column = hll_sketch_estimate(c)

  /** Pairwise distinct-set OVERLAP estimates between the groups of a
    * `(key, sketch)` frame, by inclusion-exclusion over HLL unions:
    * `|A∩B| ≈ |A| + |B| − |A∪B|` (clamped at 0 — small true overlaps
    * can go negative under sketch noise). This is how cross-corpus /
    * cross-source duplication ("how much of source A is also in B?")
    * is estimated at 100 TB: per-group sketches are KBs, the pair join
    * is |groups|² over a FRAME OF GROUPS, and the raw values never
    * shuffle — versus the exact path's value-grain self-join. HLL
    * supports union only, so intersection must come from
    * inclusion-exclusion; its error scales with the UNION size
    * (≈1.04/√2^lgK relative), which is the envelope the certification
    * query asserts.
    *
    * Output per pair (key_a < key_b): both keys, `est_a`, `est_b`,
    * `est_union`, `est_inter`.
    */
  def pairwiseOverlap(sketches: DataFrame, keyCol: String,
                      sketchCol: String): DataFrame = {
    val a = sketches.select(col(keyCol).as("key_a"),
      col(sketchCol).as("__sk_a"))
    val b = sketches.select(col(keyCol).as("key_b"),
      col(sketchCol).as("__sk_b"))
    a.join(b, col("key_a") < col("key_b"))
      .select(col("key_a"), col("key_b"),
        hll_sketch_estimate(col("__sk_a")).as("est_a"),
        hll_sketch_estimate(col("__sk_b")).as("est_b"),
        hll_sketch_estimate(hll_union(col("__sk_a"), col("__sk_b")))
          .as("est_union"))
      .withColumn("est_inter",
        greatest(col("est_a") + col("est_b") - col("est_union"), lit(0L)))
  }
}
