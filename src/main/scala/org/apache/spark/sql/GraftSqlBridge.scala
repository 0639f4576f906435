package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal private[sql] bridge: build a DataFrame from a custom
  * LogicalPlan (graft.plans.AsOfJoinPlan). The usual technique for
  * third-party operators until SPARK-exposed plan injection covers
  * dataset construction. */
object GraftSqlBridge {
  def ofRows(spark: classic.SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark, plan)

  /** Wrap a 1-row/1-col DataFrame as a scalar-subquery Column — the
    * lazy alternative to collect()-then-lit() for expressions that
    * demand a constant (e.g. BloomFilterMightContain). The subquery
    * subtree executes with the enclosing query, not at plan-build
    * time; this is exactly the shape Spark's InjectRuntimeFilter
    * emits for its own runtime bloom filters. */
  def scalarSubquery(df: DataFrame): Column =
    classic.ExpressionUtils.column(
      catalyst.expressions.ScalarSubquery(df.queryExecution.analyzed))
}
