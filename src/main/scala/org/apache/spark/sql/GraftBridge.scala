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

  /** Explain `plan` WITHOUT executing it: Dataset.ofRows runs
    * command nodes eagerly (CommandExecutionMode.ALL), so explaining
    * a side-effecting statement (GRAFT NATIVE, INDEX, ...) through it
    * would execute the side effect just to print the plan. SKIP mode
    * renders the command node instead. */
  def explainString(spark: SparkSession, plan: LogicalPlan,
      mode: org.apache.spark.sql.execution.ExplainMode): String =
    new org.apache.spark.sql.execution.QueryExecution(
      spark.asInstanceOf[classic.SparkSession], plan,
      new org.apache.spark.sql.catalyst.QueryPlanningTracker(None),
      org.apache.spark.sql.execution.CommandExecutionMode.SKIP,
      org.apache.spark.sql.execution.DoNotCleanup, false)
      .explainString(mode)
}
