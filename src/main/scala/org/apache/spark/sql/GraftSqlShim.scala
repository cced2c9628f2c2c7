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
}
