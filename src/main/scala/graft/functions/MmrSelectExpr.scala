package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Greedy Maximal-Marginal-Relevance selection over ONE query's candidate
  * array — the expression form that turns [[graft.x.Similarity.mmrSelect]]
  * into a single-shuffle plan: `groupBy(query).agg(collect_list(...))` →
  * this expression → `explode`. The k-round DataFrame formulation it
  * replaced re-scanned and re-shuffled the candidate frame once per round
  * (k sequential job barriers — fine algebra, wrong engine shape); here
  * the greedy trajectory runs in registers over the already-grouped
  * array, and the candidate pool is bounded by the first-stage top-N
  * contract, so per-group memory is O(N·dim) — the same contract
  * [[TopKAgg]] documents.
  *
  * Selection semantics (must stay bit-identical to the x149 oracle's
  * unrolled rounds): round 1 maximizes λ·rel; later rounds maximize
  * λ·rel − (1−λ)·maxsim with maxsim the running max of left-to-right
  * float-dot products against every selected vector ([[DotProductFloat]]'s
  * fold); all ties break toward the smaller id.
  *
  * Input: `array<struct<id bigint, rel double, vec array<float>>>`.
  * Output: `array<struct<rank int, id bigint, rel double, score double>>`
  * in pick order.
  */
case class MmrSelectExpr(child: Expression, k: Int, lambda: Double)
    extends UnaryExpression {
  require(k >= 1, s"mmr k=$k must be >= 1")
  require(lambda >= 0.0 && lambda <= 1.0, s"mmr lambda=$lambda outside [0,1]")

  override def dataType: DataType = MmrSelectExpr.outType
  override def prettyName: String = "mmr_select"

  // strict analysis typing (the DotProductInt rationale): the runner reads
  // the struct fields type-punned (getLong/getDouble/toFloatArray), so a
  // candidate array built with e.g. (int, float, array<double>) fields
  // would read GARBAGE values from UnsafeRow slots, not fail — make the
  // mismatch an analysis error instead
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(StructType(Array(
        StructField(_, LongType, _, _),
        StructField(_, DoubleType, _, _),
        StructField(_, ArrayType(FloatType, _), _, _))), _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<struct<id bigint, rel double, " +
          s"vec array<float>>>, got ${other.simpleString}")
    }
  }

  override def nullSafeEval(in: Any): Any =
    MmrSelectExpr.run(in.asInstanceOf[ArrayData], k, lambda)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MmrSelectExpr.run($c, $k, ${lambda}d);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MmrSelectExpr {

  val outType: DataType = ArrayType(StructType(Seq(
    StructField("rank", IntegerType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("rel", DoubleType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)

  /** Shared by interpreted eval and generated code. */
  def run(cands: ArrayData, k: Int, lambda: Double): ArrayData = {
    val n = cands.numElements()
    val ids = new Array[Long](n)
    val rels = new Array[Double](n)
    val vecs = new Array[Array[Float]](n)
    var i = 0
    while (i < n) {
      val row = cands.getStruct(i, 3)
      ids(i) = row.getLong(0)
      rels(i) = row.getDouble(1)
      vecs(i) = row.getArray(2).toFloatArray()
      i += 1
    }
    val taken = new Array[Boolean](n)
    val maxsim = new Array[Double](n)
    val out = new Array[Any](math.min(k, n))
    val oneMinus = 1.0 - lambda
    var r = 0
    while (r < out.length) {
      var best = -1
      var bestScore = 0.0
      i = 0
      while (i < n) {
        if (!taken(i)) {
          val score =
            if (r == 0) lambda * rels(i)
            else lambda * rels(i) - oneMinus * maxsim(i)
          if (best < 0 || score > bestScore ||
              (score == bestScore && ids(i) < ids(best))) {
            best = i; bestScore = score
          }
        }
        i += 1
      }
      taken(best) = true
      out(r) = new GenericInternalRow(
        Array[Any](r + 1, ids(best), rels(best), bestScore))
      // fold the new pick into every remaining candidate's running max
      val pv = vecs(best)
      i = 0
      while (i < n) {
        if (!taken(i)) {
          val d = dot(vecs(i), pv)
          maxsim(i) = if (r == 0) d else math.max(maxsim(i), d)
        }
        i += 1
      }
      r += 1
    }
    new GenericArrayData(out)
  }

  /** Left-to-right double accumulation — [[DotProductFloat]]'s fold. */
  private def dot(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  /** Column-level entry point. */
  def select(cands: Column, k: Int, lambda: Double): Column =
    ColumnBridge.column(MmrSelectExpr(ColumnBridge.expression(cands), k, lambda))
}
