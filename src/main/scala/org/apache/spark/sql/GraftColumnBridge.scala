package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the sql-package-private Column<->Expression converters — the
  * standard pattern for libraries shipping native Catalyst expressions
  * (Spark 4 moved these behind `private[sql]` in
  * org.apache.spark.sql.classic.ExpressionUtils).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a custom logical plan (e.g. graft.plans.TopKPerKey) as a
    * DataFrame — `Dataset.ofRows` is `private[sql]` in Spark 4.
    */
  def ofRows(spark: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
