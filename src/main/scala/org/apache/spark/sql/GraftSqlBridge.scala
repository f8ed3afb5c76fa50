package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one necessary `private[sql]` bridge: turning a custom
  * [[LogicalPlan]] node into a user-facing [[DataFrame]] requires
  * `Dataset.ofRows`, which Spark scopes to its own package (the classic
  * `Dataset` object is `private[sql]` in Spark 4). Extension libraries
  * conventionally host exactly this shim inside `org.apache.spark.sql`;
  * everything else in graft lives in its own namespace and uses public
  * APIs only.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
