package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column ⇄ Expression conversions so the
  * engine can expose native Catalyst expressions (e.g.
  * [[graft.sim.CosineSimilarity]]) through the public Column API without
  * requiring session-extension registration. The same pattern is used by
  * open-source Spark extension libraries that ship custom expressions.
  */
object GraftSqlShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eagerly convert a Column to its Catalyst expression.
    * `ExpressionUtils.expression` returns a LAZY ColumnNodeExpression
    * wrapper that only the analyzer unwraps for built-in operators; a
    * custom logical node needs the converted tree up front (e.g. to
    * pattern-match SortOrder), and the wrapper's internal nodes are
    * not serializable if they survive into a physical plan. */
  def eagerExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Wrap a (possibly custom) logical plan as a DataFrame — the
    * entry point a custom whole-operator node (e.g.
    * [[graft.plans.TopKPerKey]]) needs to join the public API. */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
