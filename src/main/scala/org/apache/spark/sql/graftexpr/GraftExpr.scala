package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** The one standard seam for wrapping a custom Catalyst `Expression` in a
  * public `Column` on Spark 4 (where `new Column(expr)` is gone and
  * `classic.ExpressionUtils` is `private[sql]`): a two-method bridge living
  * under `org.apache.spark.sql`, the same pattern every third-party
  * expression library uses. Keep this file to exactly these two
  * delegations — graft code must otherwise stay out of Spark's packages. */
object GraftExpr {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
