package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd Hilbert space-filling-curve index of a 2-D cell coordinate
  * (the classic xy2d bit-interleave-with-rotation walk; Hilbert 1891, the
  * standard iterative formulation).
  *
  * Why a curve index at 100 TB: multi-dimensional clustered LAYOUT. Sort a
  * fact table by `hilbert_idx(dim1_bucket, dim2_bucket)` before writing
  * and both dimensions' range predicates prune file-level min/max zones —
  * the same role as [[graft.x.Layout]]'s z-order (x26), but Hilbert's
  * unit-step walk never takes the long diagonal jumps that give Z-curves
  * their worst-case zone spread, so per-file min/max ranges stay tighter
  * and scans skip more files (the documented reason Databricks/Iceberg
  * offer Hilbert alongside Z).
  *
  * Pure integer state machine — `bits` rounds of shift/mask/conditional
  * swap — so any engine replays it exactly (the DuckDB oracle unrolls the
  * rounds as CTEs); evaluated as a tight generated-Java loop inside
  * whole-stage codegen, one long of state per side.
  *
  * Inputs are cell coordinates in [0, 2^bits); `bits` ≤ 30 keeps
  * d = x·y interleave within BIGINT. Out-of-range coordinates are masked
  * to the low `bits` bits (deterministic, documented — callers bucket
  * first). Null in → null out (BinaryExpression contract).
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 30, s"hilbert bits $bits outside [1,30]")

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_idx"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val mask = (1L << bits) - 1
    var x = a.asInstanceOf[Long] & mask
    var y = b.asInstanceOf[Long] & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) { // rotate quadrant so the walk stays unit-step
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val d = ctx.freshName("d"); val s = ctx.freshName("s")
      val rx = ctx.freshName("rx"); val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $x = $a & ${(1L << bits) - 1}L;
         |long $y = $b & ${(1L << bits) - 1}L;
         |long $d = 0L;
         |for (long $s = ${1L << (bits - 1)}L; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0) {
         |    if ($rx == 1) { $x = $s - 1 - $x; $y = $s - 1 - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  /** Column surface: `hilbertIdx(x, y, bits)` over LongType cells. */
  def hilbertIdx(x: Column, y: Column, bits: Int): Column =
    ColumnBridge.column(HilbertIndex(
      ColumnBridge.expression(x.cast("long")),
      ColumnBridge.expression(y.cast("long")), bits))
}
