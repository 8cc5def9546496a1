package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to the `private[sql]` Column↔Expression conversions
  * (Spark 4 moved them behind org.apache.spark.sql.classic). Lives in
  * the spark.sql package solely to satisfy the access modifier — the
  * standard extension-library escape hatch. */
package object graftshim {
  def toExpr(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def toCol(e: Expression): Column = classic.ExpressionUtils.column(e)
  /** Wrap a (resolved) logical plan as a DataFrame — the hook custom
    * logical operators need to enter the Dataset API. */
  def ofRows(spark: SparkSession, plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
