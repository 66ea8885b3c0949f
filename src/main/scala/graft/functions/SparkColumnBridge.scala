/** Bridge into Spark's classic Column <-> Expression conversion, which is
  * `private[sql]` at the Scala level in Spark 4 (the Column class itself no
  * longer exposes `.expr`). Declared under org.apache.spark.sql so the
  * access qualifier admits it — the one place this library steps inside
  * Spark's package namespace, kept deliberately minimal. */
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
