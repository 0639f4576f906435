package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal private[sql] bridge: build a DataFrame from a custom
  * LogicalPlan (graft.plans.AsOfJoinPlan). The usual technique for
  * third-party operators until SPARK-exposed plan injection covers
  * dataset construction. */
object GraftSqlBridge {
  def ofRows(spark: classic.SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark, plan)
}
