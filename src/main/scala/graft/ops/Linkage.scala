package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage: score candidate pairs
  * by summing per-field log-likelihood-ratio weights — `ln(m/u)` when a
  * field agrees, `ln((1−m)/(1−u))` when it disagrees — where `m` is the
  * field's agreement probability among true matches and `u` among
  * non-matches (the 1969 JASA model; the standard ER scorer behind
  * tools like Splink). Candidates come from any blocking pass
  * ([[graft.llm.SetSim.sortedNeighborhoodPairs]] with threshold 0, LSH
  * pairs, etc.) — this module only scores and classifies, so the
  * quadratic part of ER stays in the candidate generator's hands.
  *
  * Determinism: each field's two weights are fixed-pointed ONCE to
  * integer micro-ln units driver-side (HALF_UP — the same grid
  * discipline as [[graft.llm.LangModel]]); a pair's score is then an
  * exact integer sum, and the one double division happens at read time.
  * Missing evidence (null agreement) contributes weight 0 — the
  * agnostic prior, not a disagreement.
  *
  * Scale shape: scoring is MAP-ONLY over the candidate frame (a case
  * expression per field, one projection); classification is a
  * threshold compare. Nothing shuffles that the candidate generator
  * didn't already shuffle.
  */
object Linkage {

  /** One field's evidence model: `agree` is any boolean Column over the
    * candidate frame; `m`/`u` the match/non-match agreement rates.
    */
  final case class FieldModel(name: String, agree: Column, m: Double, u: Double)

  /** The exact micro-ln (agreement, disagreement) weights a field
    * contributes — exposed so SQL twins can embed the same literals.
    */
  def weightsMicro(m: Double, u: Double): (Long, Long) = {
    require(m > 0 && m < 1, s"m=$m out of (0,1)")
    require(u > 0 && u < 1, s"u=$u out of (0,1)")
    require(m > u, s"m=$m must exceed u=$u (agreement must be evidence FOR)")
    def fix(x: Double) = BigDecimal(x * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    (fix(math.log(m / u)), fix(math.log((1 - m) / (1 - u))))
  }

  /** Candidate frame + `score_micro` (exact integer) + `score` (the
    * 6dp log-likelihood ratio in natural-log units).
    */
  def scorePairs(candidates: DataFrame, fields: Seq[FieldModel]): DataFrame = {
    require(fields.nonEmpty, "no fields to score")
    require(fields.map(_.name).distinct.size == fields.size,
      s"duplicate field names: ${fields.map(_.name)}")
    val contribs = fields.map { f =>
      val (wa, wd) = weightsMicro(f.m, f.u)
      when(f.agree, lit(wa)).when(!f.agree, lit(wd)).otherwise(lit(0L))
    }
    candidates
      .withColumn("score_micro", contribs.reduce(_ + _))
      .withColumn("score",
        round(col("score_micro").cast("double") / 1e6, 6))
  }

  /** [[scorePairs]] + a three-way verdict: `match` at/above `upper`,
    * `non_match` at/below `lower`, `possible` between (the clerical-
    * review band of the original model). Thresholds compare on the
    * EXACT integer micro score, so classification is engine-invariant.
    */
  def classifyPairs(candidates: DataFrame, fields: Seq[FieldModel],
                    upper: Double, lower: Double): DataFrame = {
    require(lower < upper, s"lower=$lower must be < upper=$upper")
    def micro(x: Double) = BigDecimal(x * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    scorePairs(candidates, fields)
      .withColumn("verdict",
        when(col("score_micro") >= micro(upper), "match")
          .when(col("score_micro") <= micro(lower), "non_match")
          .otherwise("possible"))
  }
}
