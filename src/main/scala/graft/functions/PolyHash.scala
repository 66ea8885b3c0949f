package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Portable 55-bit polynomial string hash: `h := (h*131 + codepoint) & (2^55-1)`.
  *
  * Why not xxhash64: the hash must be REPLAYABLE BY THE ORACLE. xxhash64 has
  * no DuckDB equivalent, which demoted every hash-seeded operator (minhash
  * banding, simhash signatures, fingerprints) to a weaker rows-only check in
  * round 1. This fold is exactly expressible in portable SQL —
  *
  *   list_reduce(list_prepend(0, list_transform(string_split(s,''),
  *     c -> ord(c))), (a,b) -> (a*131+b) & 36028797018963967)
  *
  * — so the whole near-dup pipeline becomes oracle-checkable. The 55-bit
  * mask keeps `h*131` inside a signed 64-bit range on BOTH engines (DuckDB
  * BIGINT multiplication raises on overflow rather than wrapping; 2^55 *
  * 131 < 2^63). Derived per-bit/per-permutation hashes go through
  * [[PortableHash]] universal affine transforms mod 2^31-1, which likewise
  * never overflow.
  *
  * Codegen: single tight loop, no allocation; stays inside whole-stage
  * codegen like any UnaryExpression.
  */
case class PolyHash56(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash56"

  override def nullSafeEval(input: Any): Any =
    PolyHash56.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash56.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyHash56 {
  val Mask55: Long = (1L << 55) - 1

  /** Reference fold — code-point iteration matches DuckDB `ord()` over
    * per-character split (identical for all of BMP; the fixtures are ASCII). */
  def hash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 131 + cp) & Mask55
      i += Character.charCount(cp)
    }
    h
  }

  def apply(c: Column): Column = ColumnBridge.column(PolyHash56(ColumnBridge.expression(c)))
}

/** Shared constants + derived universal hashes for the portable near-dup
  * operators. Every constant is consumed BOTH by the Scala operators and by
  * the oracle-SQL builder in [[graft.SparkEntry]], so the two engines agree
  * by construction. */
object PortableHash {
  /** 2^31-1 (prime): affine transforms `(a*h + b) mod M31` with `h, a, b <
    * M31` keep products under 2^62 — exact in BIGINT on both engines. */
  val M31: Long = 2147483647L

  // public: the oracle-SQL builder re-derives the same per-index constants
  val KnuthA: Long = 2654435761L % M31 // Knuth multiplicative constant
  val LcgB: Long = 1013904223L         // Numerical Recipes increment
  val Lcg64A: Long = 2862933555777941757L % M31

  /** MinHash permutation i: `(a_i * (h mod M31) + b_i) mod M31`. */
  def minhashA(i: Int): Long = ((i + 1) * KnuthA) % M31
  def minhashB(i: Int): Long = ((i + 1) * LcgB) % M31

  /** SimHash bit b: parity of an independent universal hash of the token. */
  def simhashA(b: Int): Long = ((b + 1) * Lcg64A) % M31
  def simhashB(b: Int): Long = ((b + 7) * LcgB) % M31
}
