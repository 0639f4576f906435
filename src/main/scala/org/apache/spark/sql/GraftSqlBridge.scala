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

  /** Column-level entry for graft.functions.FastDecimal without a
    * per-session registry round trip (Tables.dec2/dec4 are called from
    * code paths that never run GraftFunctions.register). */
  def fastDec(c: Column, precision: Int, scale: Int): Column =
    classic.ExpressionUtils.column(graft.functions.FastDecimal(
      classic.ExpressionUtils.expression(c), precision, scale))
}
