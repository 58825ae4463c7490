package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` Dataset factory so graft's custom
  * logical plans (graft.plans.DistinctOnPlan et al.) can be wrapped
  * back into a DataFrame. This is the standard extension-library
  * pattern for plugging custom Catalyst nodes into the public API
  * surface — the only member accessed is Dataset.ofRows.
  */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
