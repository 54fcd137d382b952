package graft.pdq

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Staging → curated star schema (reference/spark_jobs/model_curated.py).
  *
  * Dimensions are `na.drop().dropDuplicates(pk)` loads (A6,
  * model_curated.py:143-166); facts are plain projections carrying natural
  * keys (model_curated.py:179-189 — the reference never joins the star).
  * The Postgres `ON CONFLICT` upsert the reference does out-of-band (S8)
  * lives in [[graft.sinks.Upsert]]; here we build the frames.
  */
object Curated {

  /** dim_operator — distinct (operator_no, operator_name). */
  def dimOperator(operatorMonthly: DataFrame): DataFrame =
    operatorMonthly.select(col("operator_no"), col("operator_name"))
      .na.drop(Seq("operator_no"))
      .dropDuplicates("operator_no")

  /** dim_district — distinct district keys (model_curated.py:151). */
  def dimDistrict(leaseMonthly: DataFrame): DataFrame =
    leaseMonthly.select(col("district_no")).na.drop().dropDuplicates("district_no")

  /** dim_field — distinct field keys (model_curated.py:158). */
  def dimField(leaseMonthly: DataFrame): DataFrame =
    leaseMonthly.select(col("field_no")).na.drop().dropDuplicates("field_no")

  /** dim_lease — lease surrogate + attributes (model_curated.py:165-166). */
  def dimLease(leaseMonthly: DataFrame): DataFrame =
    leaseMonthly.select(
        col("lease_key"), col("operator_no"), col("district_no"),
        col("field_no"), col("lease_no"), col("lease_name"))
      .na.drop(Seq("lease_key"))
      .dropDuplicates("lease_key")

  /** fact_operator_monthly — projection at (operator_no, yyyymm) grain. */
  def factOperatorMonthly(operatorMonthly: DataFrame): DataFrame =
    operatorMonthly.select(
      col("operator_no"), col("yyyymm"),
      col("oil_bbl"), col("gas_mcf"), col("cond_bbl"), col("csgd_mcf"))

  /** fact_lease_monthly — projection at (lease_key, yyyymm) grain. */
  def factLeaseMonthly(leaseMonthly: DataFrame): DataFrame =
    leaseMonthly.select(
      col("lease_key"), col("yyyymm"),
      col("oil_bbl"), col("gas_mcf"), col("cond_bbl"), col("csgd_mcf"))
}
