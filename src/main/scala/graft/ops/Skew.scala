package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.HeavyHittersAgg

/** Skew diagnostics BEFORE the expensive shuffle: which join/group keys
  * are hot, and by how much. The question every 100 TB straggler
  * postmortem starts with — answered here in ONE pass with no (key,
  * count) shuffle: row count, approximate distinct-key count, and the
  * Misra-Gries hot-key summary ([[graft.functions.HeavyHittersAgg]])
  * ride a single aggregation whose partials are sketch-sized.
  *
  * Feed the result into the mitigation this library already has:
  * `skew_vs_avg` ≳ tasks-per-executor → salt the key
  * ([[Salt.saltedJoin]]) or cap the bucket
  * ([[graft.llm.Dedup.embeddingNearDups]]'s `maxBucketSize`).
  */
object Skew {

  /** Top-`topN` hottest values of `keyCol`: estimated count, share of
    * all rows, and multiple vs the average key. Misra-Gries estimates
    * UNDERCOUNT (never inflate), so a reported skew factor is a floor —
    * safe to alert on. `capacity` bounds the sketch (any key with share
    * > 1/(capacity+1) is guaranteed present).
    */
  def report(df: DataFrame, keyCol: String,
             topN: Int = 10, capacity: Int = 1024): DataFrame =
    df.agg(
        count(lit(1)).as("__n"),
        approx_count_distinct(col(keyCol)).as("__nd"),
        HeavyHittersAgg.heavyHitters(col(keyCol).cast("string"), capacity).as("__hh"))
      .select(col("__n"), col("__nd"), explode(col("__hh")).as("e"))
      .select(
        col("e.item").as("key"),
        col("e.est_count").as("est_count"),
        (col("e.est_count").cast("double") / col("__n")).as("est_share"),
        (col("e.est_count").cast("double") * col("__nd") / col("__n"))
          .as("skew_vs_avg"))
      .orderBy(col("est_count").desc, col("key"))
      .limit(topN)
}
