package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column <-> Expression bridge for graft's native Catalyst expressions
 * (`graft/functions/VectorExpressions.scala`).
 *
 * Spark 4 made `classic.ExpressionUtils` `private[sql]`, so a library
 * that ships its own `Expression`s needs one object inside the
 * `org.apache.spark.sql` namespace to lift them into public `Column`s —
 * the standard extension-library technique (Delta, Sedona, etc. each
 * carry the same shim). This is the ONLY file outside the `graft`
 * package, and it contains no logic.
 */
object GraftSqlShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
