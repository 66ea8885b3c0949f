package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Jaro–Winkler similarity (Jaro 1989; Winkler 1990) — the
  * record-linkage string comparator: Jaro's transposition-tolerant match
  * score boosted by up to 4 chars of common prefix when the base score
  * clears 0.7 (the published boost threshold). Semantics match DuckDB's
  * `jaro_winkler_similarity` exactly — verified value-for-value including
  * the empty-string → 0.0 convention and the boost threshold — so the
  * expression is oracle-replayable.
  *
  * Spark ships `levenshtein` but no Jaro–Winkler; for name/address
  * linkage JW is the standard comparator (edit distance over-penalizes
  * transpositions, the dominant typo class in names). A scalar UDF here
  * would box two strings per candidate pair inside the blocking join's
  * hot loop; this is a Catalyst `BinaryExpression` whose generated code
  * is one static call on the raw `UTF8String`s, staying inside
  * whole-stage codegen (the [[DotProductFloat]] promotion rationale).
  *
  * O(len1·len2) worst case within the match window — bounded in practice
  * by [[graft.x.Dedup.editDistancePairs]]-style blocking; never run it
  * un-blocked across a corpus.
  */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerExpr.jw(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinklerExpr.jw($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object JaroWinklerExpr {

  /** Entry point shared by interpreted eval and generated code. */
  def jw(a: UTF8String, b: UTF8String): Double = compute(a.toString, b.toString)

  /** Classic Jaro with the Winkler prefix boost (p = 0.1, prefix ≤ 4,
    * boost only above jaro 0.7); either side empty → 0.0 (DuckDB's
    * convention, which differs from "both empty → 1" variants). */
  def compute(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (s1 == s2) return 1.0
    val window = math.max(l1, l2) / 2 - 1
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && s2.charAt(j) == s1.charAt(i)) {
          m1(i) = true; m2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - t) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var p = 0
    val maxP = math.min(4, math.min(l1, l2))
    while (p < maxP && s1.charAt(p) == s2.charAt(p)) p += 1
    jaro + p * 0.1 * (1.0 - jaro)
  }

  /** Column-level entry point. */
  def similarity(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinklerExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
