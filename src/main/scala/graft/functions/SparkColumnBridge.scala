/** Bridge into Spark's classic Column <-> Expression conversion, which is
  * `private[sql]` at the Scala level in Spark 4 (the Column class itself no
  * longer exposes `.expr`). Declared under org.apache.spark.sql so the
  * access qualifier admits it — the one place this library steps inside
  * Spark's package namespace, kept deliberately minimal. */
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Runtime function registration on a live session — the same
    * FunctionRegistry write `SparkSessionExtensions.injectFunction` does at
    * session build time, for callers that receive an already-built session
    * (the Orchestrator's contract). `sessionState` is `@Unstable` rather
    * than private, but the classic-session downcast belongs here with the
    * rest of the internal-API surface. */
  def registerFunction(
      spark: SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(ident, info, builder)
}
