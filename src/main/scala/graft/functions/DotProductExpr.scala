package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd dot product over two ArrayType(FloatType) columns.
  *
  * Promotion per SURVEY.md §4: the composed `aggregate(zip_with(...))`
  * higher-order-function form is evaluated through interpreted lambda
  * closures (one function call + boxing per element); for similarity
  * search that expression sits inside an n_corpus × n_candidates loop, so
  * it was measurably the hot path at sf0.1. This expression evaluates the
  * same left-to-right double accumulation as a tight primitive loop, both
  * interpreted and in generated Java, so results are bit-identical to the
  * HOF form (and to the DuckDB oracle's fold).
  *
  * Nulls: null array → null result (standard BinaryExpression null
  * semantics); mismatched lengths fold over the shorter prefix, matching
  * `zip_with`'s null-padding + `x * null = null` elimination — callers in
  * this library always pass equal-length vectors.
  */
case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must be ArrayType(FloatType) — callers in graft.functions ensure it
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product_f"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object DotProductFloat {
  /** Column-level entry point used by [[VectorFunctions]]. */
  def dot(a: Column, b: Column): Column = ColumnBridge.column(DotProductFloat(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
