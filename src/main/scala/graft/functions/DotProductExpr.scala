package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

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

  // strict analysis typing (r12): a non-float array through the SQL
  // surface is an analysis error, not a 4-of-8-byte garbage read
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<float>, array<float>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
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

/** Shared skeleton of the EXACT integer array folds over two
  * ArrayType(IntegerType) columns (the [[graft.x.Similarity.int8Codes]]
  * representation): one fused loop, BIGINT accumulator, strict analysis
  * typing (checkInputDataTypes — a double/bigint array is an analysis
  * error, never 4-of-8-byte garbage reads).
  *
  * NULL/LENGTH semantics replicate the `aggregate(zip_with(...))` HOF
  * forms these expressions replaced EXACTLY, so results stay
  * bit-identical to the DuckDB oracle's fold on every input class:
  * a null array → null (BinaryExpression); MISMATCHED lengths → null
  * (zip_with pads the shorter side with nulls, and one null lane nulls
  * the HOF sum); a null LANE → null (same propagation — int8Codes maps
  * a null float element to a null code lane, so dirty vectors must
  * score null, not a finite wrong value).
  *
  * Promotion rationale (same as [[DotProductFloat]]): the HOF form
  * materializes a zip_with intermediate array per evaluated PAIR, and
  * these sit inside n_corpus × n_candidates loops (int8TopK,
  * int8IvfTopK, the x226 drift monitor's three probe passes) — the
  * fused loop reads both arrays in place. No overflow at int8
  * magnitudes (|combine| ≤ 2·127² per lane, dims ≪ 2⁴⁴ lanes). */
abstract class Int8ArrayFold extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<int>, array<int>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  /** Per-lane contribution added to the long accumulator. */
  protected def combine(x: Int, y: Int): Long
  /** Java source of the per-lane contribution (same math as combine). */
  protected def combineCode(x: String, y: String): String

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += combine(x.getInt(i), y.getInt(i))
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
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ${combineCode(s"$a.getInt($i)", s"$b.getInt($i)")};
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
}

/** Σ (long)xᵢ·(long)yᵢ — exact BIGINT dot product; norms via dot(c, c). */
case class DotProductInt(left: Expression, right: Expression)
    extends Int8ArrayFold {
  override def prettyName: String = "dot_product_i"
  override protected def combine(x: Int, y: Int): Long = x.toLong * y.toLong
  override protected def combineCode(x: String, y: String): String =
    s"(long) $x * (long) $y"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object DotProductInt {
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductInt(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Σ (xᵢ−yᵢ)² — exact BIGINT squared L2; the cell-argmin workhorse of
  * the int8 tier (Lloyd assignment, IVF probe selection, farthest-first
  * seeding, silhouette). */
case class SqDistInt(left: Expression, right: Expression)
    extends Int8ArrayFold {
  override def prettyName: String = "sq_dist_i"
  override protected def combine(x: Int, y: Int): Long = {
    val d = x.toLong - y.toLong; d * d
  }
  override protected def combineCode(x: String, y: String): String =
    s"((long) $x - (long) $y) * ((long) $x - (long) $y)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SqDistInt {
  def dist(a: Column, b: Column): Column =
    ColumnBridge.column(SqDistInt(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
