package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

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

/** Codegen'd EXACT integer dot product over two ArrayType(IntegerType)
  * columns (the [[graft.x.Similarity.int8Codes]] representation):
  * Σ (long)xᵢ·(long)yᵢ as a BIGINT — no overflow at int8 magnitudes
  * (|x·y| ≤ 127² per lane, dims ≪ 2⁴⁴ lanes), no rounding, so the result
  * is bit-identical to the `aggregate(zip_with(...))` HOF form it
  * replaces AND order-independent (exact integer sum), which is what
  * keeps the int8 ANN family oracle-replayable.
  *
  * Promotion rationale (same as [[DotProductFloat]]): the HOF form
  * materializes a zip_with intermediate array per evaluated PAIR, and
  * these sit inside n_corpus × n_candidates loops (int8TopK,
  * int8IvfTopK, the x226 drift monitor's three probe passes) — the
  * fused loop reads both arrays in place. Null/length semantics match
  * [[DotProductFloat]]. */
case class DotProductInt(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dot_product_i"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getInt(i).toLong * y.getInt(i).toLong
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
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (long) $a.getInt($i) * (long) $b.getInt($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object DotProductInt {
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductInt(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Codegen'd EXACT integer squared L2 distance over two
  * ArrayType(IntegerType) columns: Σ (xᵢ−yᵢ)² as BIGINT. The cell-argmin
  * workhorse of the int8 tier (Lloyd assignment, IVF probe selection,
  * farthest-first seeding, silhouette) — same exactness/order-independence
  * contract and the same HOF-replacement rationale as [[DotProductInt]]. */
case class SqDistInt(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sq_dist_i"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = x.getInt(i).toLong - y.getInt(i).toLong
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = (long) $a.getInt($i) - (long) $b.getInt($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SqDistInt {
  def dist(a: Column, b: Column): Column =
    ColumnBridge.column(SqDistInt(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
