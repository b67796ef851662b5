package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` Column↔Expression converters of Spark 4's
  * classic API — the standard pattern for libraries registering custom
  * Catalyst expressions without SparkSessionExtensions.
  */
object GraftColumnBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame over an arbitrary analyzed LogicalPlan — lets library code
    * run a side aggregation over a subtree it detected inside a user
    * query's plan (the SQL door's range-join width auto-tuner). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Name of the (unresolved) function a Column invokes, if it is one —
    * Spark 4's functions API builds connect-style ColumnNodes, so the
    * function is visible only at the node layer pre-analysis. */
  def functionName(c: Column): Option[String] = c.node match {
    case f: internal.UnresolvedFunction => Some(f.functionName)
    case _ => None
  }

  /** (name, isDistinct) of the function a Column invokes. Callers deciding
    * algebraic-recombination safety (salted two-phase aggregation) MUST
    * check the distinct flag: count(DISTINCT x) partials do NOT recombine
    * by summing. */
  def functionNameDistinct(c: Column): Option[(String, Boolean)] = c.node match {
    case f: internal.UnresolvedFunction => Some((f.functionName, f.isDistinct))
    case _ => None
  }
}
