package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Classic-API bridge from a Catalyst [[LogicalPlan]] to a [[DataFrame]].
  *
  * Libraries that contribute whole operators (custom logical node +
  * strategy + physical plan) need `Dataset.ofRows` to hand the composed
  * plan back to users as a normal DataFrame; Spark keeps it
  * `private[sql]`, so this shim re-exports it from an
  * `org.apache.spark.sql` subpackage (same pattern as [[ColumnBridge]]).
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
