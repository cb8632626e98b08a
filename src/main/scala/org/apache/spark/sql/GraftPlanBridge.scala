package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway the custom-LogicalPlan tier needs:
  * wrapping a plan this library constructed back into a DataFrame.
  * Lives in the Spark SQL package by the standard extension-library
  * convention (the registration side — strategies, functions — goes
  * through the public `SparkSessionExtensions` API; only plan
  * CONSTRUCTION has no public entry point). Nothing else in this
  * repo reaches into Spark internals this way. */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
