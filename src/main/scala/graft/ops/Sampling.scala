package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic systematic probability-proportional-to-size (PPS)
  * sampling: lay every row's integer weight end-to-end along a line (in
  * a fixed key order), then select the row owning each multiple of
  * `stride`. Selection probability is proportional to weight, heavy
  * rows (weight ≥ stride) are always taken, and the expected sample
  * size is `total_weight / stride` — the classic survey-statistics
  * systematic PPS design, here with a deterministic order instead of a
  * random start so reruns and engines agree bit-for-bit.
  *
  * Complements the hash-based fixed-RATE samplers
  * ([[graft.llm.Curation.sampleHash]], `stratifiedSample`): those give
  * every row the same chance; this one sizes each row's chance by its
  * weight (bytes, revenue, token count), which is what corpus builders
  * weighting by document length actually want.
  *
  * Scale shape: one window pass per group in `orderKey` order — the
  * same shuffle any per-group cumulative metric needs. All arithmetic
  * is integer (long), so the DuckDB twin matches exactly.
  */
object Sampling {

  /** Input rows + `cum_w` (inclusive cumulative weight) + `selected`:
    * true when the row's span `(cum_w - w, cum_w]` covers a multiple of
    * `stride` (multiples are 1-based: spans covering `stride`,
    * `2*stride`, … — a zero-weight row never selects). Weights must be
    * non-negative; `orderKey` must be unique per group for the
    * cumulative order to be deterministic.
    */
  def ppsSystematic(df: DataFrame, groupCols: Seq[String], orderKey: Column,
                    weight: Column, stride: Long): DataFrame = {
    require(stride > 0, s"stride=$stride must be positive")
    val g = groupCols.map(col)
    val w = weight.cast("long")
    val byKey = Window.partitionBy(g: _*).orderBy(orderKey)
    val checked = df.where(
      when(w < 0, raise_error(lit("ppsSystematic: negative weight")))
        .otherwise(lit(true)))
    checked
      .withColumn("__w", w)
      .withColumn("cum_w",
        sum(col("__w")).over(byKey.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .withColumn("selected",
        expr(s"cum_w div ${stride}L > (cum_w - __w) div ${stride}L"))
      .drop("__w")
  }

  /** Efraimidis–Spirakis (A-ES) reservoir key in nano-units: each row
    * draws `u ∈ (0,1]` DETERMINISTICALLY from 60 md5 bits of
    * `(id, seed)` and keys as `-ln(u)/w` — the k SMALLEST keys per
    * group are a weighted random sample WITHOUT replacement, inclusion
    * probability proportional to weight (the exponential-race argument:
    * key_i ~ Exp(w_i), and the minimum of independent exponentials
    * lands on i with probability w_i/Σw). Seeded hashing instead of an
    * RNG keeps reruns and engines bit-agreed; nano fixed-point absorbs
    * the last-ulp `ln` wiggle so rank comparisons are integer.
    */
  def reservoirKeyNano(id: Column, weight: Column, seed: Long): Column = {
    val ub = Fingerprint.hash60(concat(id.cast("string"), lit(":" + seed)))
    val u = (ub.cast("double") + 1.0) / lit(1152921504606846976.0) // 2^60
    round(-log(u) / weight.cast("double") * lit(1e9)).cast("long")
  }

  /** k-row weighted sample per group: rows ranked by
    * ([[reservoirKeyNano]], id) — one window pass per group, the same
    * shape as any per-group top-k. Zero/negative-weight rows are never
    * sampled (their key would be ∞). For a MERGEABLE variant whose
    * shuffle carries ≤ k entries per map partition, feed
    * `-reservoirKeyNano` as the metric of
    * [[graft.functions.TopKAgg.topK]].
    */
  def weightedReservoir(df: DataFrame, groupCols: Seq[String],
                        idCol: String, weight: Column, k: Int,
                        seed: Long): DataFrame = {
    require(k > 0, s"k=$k")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__key_nano"), col(idCol))
    df.where(weight > 0)
      .withColumn("__key_nano",
        reservoirKeyNano(col(idCol), weight, seed))
      .withColumn("sample_rank", row_number().over(w))
      .where(col("sample_rank") <= k)
      .drop("__key_nano")
  }
}
