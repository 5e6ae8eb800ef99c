package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into `private[sql]` surface: turning a hand-built
  * [[LogicalPlan]] back into a [[DataFrame]]. Lives in the
  * `org.apache.spark.sql` package solely to satisfy the access qualifier —
  * the standard pattern for Catalyst extension libraries that add their own
  * plan nodes (there is no public constructor from LogicalPlan).
  */
object GraftSqlInternals {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
