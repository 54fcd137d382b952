package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigating two-stage aggregation (salting).
  *
  * A single hot key (one giant operator / one viral document) turns a
  * groupBy into one straggler task at cluster scale. Salting splits each
  * key into `factor` deterministic sub-groups, pre-aggregates, then
  * merges — the partial-agg shuffle carries `factor` rows per hot key
  * instead of every raw row. Spark's AQE skew handling covers joins;
  * this covers aggregations, decomposable aggregates only
  * (sum/count/min/max).
  */
object Salt {

  /** `groupBy(keys).agg(sum(m))` with `factor`-way salt. The salt is a
    * deterministic hash of the whole row (`xxhash64` over all columns),
    * so results are reproducible run to run.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], measures: Seq[String],
                factor: Int = 16): DataFrame = {
    val withSalt = df.withColumn("__salt",
      pmod(xxhash64(df.columns.toIndexedSeq.map(col): _*), lit(factor)))
    val pAggs: Seq[Column] = measures.map(m => sum(col(m)).as(m))
    val partial = withSalt
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(pAggs.head, pAggs.tail: _*)
    val fAggs: Seq[Column] = measures.map(m => sum(col(m)).as(m))
    partial.groupBy(keys.map(col): _*).agg(fAggs.head, fAggs.tail: _*)
  }

  /** Join types for which [[saltedJoin]] is equivalent to the plain join:
    * inner and left-flavored only. The right side is REPLICATED across all
    * `factor` salt values, so under right/full outer joins every unmatched
    * right row would be emitted `factor` times (each replica fails to
    * match) — those types are rejected rather than silently wrong.
    */
  private val SaltableJoinTypes =
    Set("inner", "left", "leftouter", "leftsemi", "leftanti")

  /** Skew-safe equi-join: salt the big/skewed left side `factor` ways and
    * replicate the (smaller) right side across every salt value, so a hot
    * join key spreads over `factor` tasks instead of one straggler.
    * (AQE's skew-join split covers sort-merge joins adaptively; this is
    * the explicit form for when the right side is replicable and the skew
    * is known.)
    *
    * Result ≡ `left.join(right, keys, joinType)` for `joinType` in
    * inner / left / left_semi / left_anti ONLY — right/full outer joins
    * would duplicate unmatched right rows across replicas and are refused
    * (put the skewed side on the left, or use AQE skew handling).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 factor: Int = 16, joinType: String = "inner"): DataFrame = {
    val normalized = joinType.toLowerCase.replace("_", "")
    require(SaltableJoinTypes.contains(normalized),
      s"saltedJoin supports inner/left/left_semi/left_anti joins only; " +
        s"'$joinType' would emit every unmatched right row $factor times " +
        s"(the right side is replicated across salt values)")
    val l = left.withColumn("__salt",
      pmod(xxhash64(left.columns.toIndexedSeq.map(col): _*), lit(factor)).cast("int"))
    val r = right.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }
}
