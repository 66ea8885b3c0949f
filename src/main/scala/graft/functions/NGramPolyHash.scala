package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fused n-gram [[PolyHash56]]: token array → array of the poly-hashes of
  * each word n-gram, WITHOUT materializing the gram strings.
  *
  * The composed form — `transform(sequence(...), i -> poly_hash56(
  * concat_ws(' ', element_at...)))` — allocates and copies every gram
  * string (n× the text bytes) just to fold it into a long and throw it
  * away. Since the shingle stage feeds the dominant shuffle of every
  * near-dup pipeline (x2/x3/x21), that garbage is front-line cost at
  * 100 TB. This expression folds each gram's hash straight over the token
  * characters (separator codepoint 32 between tokens), producing values
  * BIT-IDENTICAL to `PolyHash56(concat_ws(" ", gram))` — so the DuckDB
  * oracle replay and every downstream constant (minhash permutations,
  * band folds) are unchanged.
  *
  * Gram rule mirrors [[graft.x.Dedup.shingles]]: tokens.length ≥ n ⇒ one
  * gram per window; shorter docs ⇒ a single whole-doc gram. Precondition:
  * no null tokens (split() never yields them).
  */
case class NGramPolyHash(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n-gram size $n must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_poly_hash56"

  // strict analysis typing (the MmrSelectExpr/DotProductInt rationale):
  // compute reads lanes with getUTF8String, so a non-string array's slots
  // would be interpreted as string offset/size pairs — corrupt values or
  // a crash, never a clean failure
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.types.StringType
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<string> tokens, got ${other.simpleString}")
    }
  }

  override def nullSafeEval(input: Any): Any =
    NGramPolyHash.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NGramPolyHash.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NGramPolyHash {
  def apply(tokens: Column, n: Int): Column =
    ColumnBridge.column(NGramPolyHash(ColumnBridge.expression(tokens), n))

  /** Shared by interpreted eval and generated code. */
  def compute(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    val strs = new Array[String](m)
    var j = 0
    while (j < m) { strs(j) = toks.getUTF8String(j).toString; j += 1 }
    val g = if (m >= n) m - n + 1 else 1
    val nn = math.min(n, m)
    val out = new Array[Long](g)
    var i = 0
    while (i < g) {
      var h = 0L
      var t = i
      val end = i + nn
      while (t < end) {
        if (t > i) h = (h * 131 + 32) & PolyHash56.Mask55 // ' ' separator
        val s = strs(t)
        var ci = 0
        while (ci < s.length) {
          val cp = s.codePointAt(ci)
          h = (h * 131 + cp) & PolyHash56.Mask55
          ci += Character.charCount(cp)
        }
        t += 1
      }
      out(i) = h
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
