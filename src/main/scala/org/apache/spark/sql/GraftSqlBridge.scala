package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway the library needs: turning a custom
  * LogicalPlan node into a DataFrame. This is the standard pattern every
  * Spark-extension library uses (a tiny object inside the
  * `org.apache.spark.sql` package) — all public Spark APIs construct
  * plans from other DataFrames, so a NEW logical operator (graft.plans
  * .AsOfJoin) has no public entry point. Nothing else from the private
  * surface is touched. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
