package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge for constructing a DataFrame from a custom LogicalPlan
  * (`Dataset.ofRows` is `private[sql]` in Spark 4's classic module —
  * same shim rationale as [[ColumnShim]]; everything referenced is
  * public Spark source). Needed by operators that introduce their own
  * logical nodes (graft.plans.AsOfJoinNode) rather than composing
  * existing ones.
  */
object DatasetShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
