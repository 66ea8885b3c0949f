package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash as a single custom aggregate (SURVEY.md §4 promotion).
  *
  * The composed-expression form needed 64 `sum(when(bit(h,b), 1, -1))`
  * aggregate expressions — a codegen blob big enough to dominate one-shot
  * query time with Janino compilation, and 64 buffer slots per group in
  * the hash map. This TypedImperativeAggregate keeps one int[64] buffer
  * per doc, folds each 64-bit token hash with shift/mask, and packs the
  * final signature long in eval. Input: the token hash (LongType).
  * Partial aggregation works (merge = vector add), so map-side combine
  * still applies before the shuffle.
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(child)
  // input must be LongType (a 64-bit token hash) — graft.x.Dedup ensures it
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash_agg"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      // Bit b votes by the PARITY of an independent universal hash of the
      // token — not by bit b of the input hash: the portable PolyHash56
      // base (see that file) leaves high bits near-zero for short tokens,
      // which would collapse every signature's top bits to the same value.
      // `(a_b*h + b_b) mod M31` parities are iid-ish AND exactly
      // replayable by the oracle's integer SQL.
      val h31 = java.lang.Math.floorMod(v.asInstanceOf[Long], PortableHash.M31)
      var b = 0
      while (b < 64) {
        val g = (SimHashAgg.A(b) * h31 + SimHashAgg.B(b)) % PortableHash.M31
        buf(b) += ((g & 1L).toInt * 2) - 1
        b += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Int], other: Array[Int]): Array[Int] = {
    var b = 0
    while (b < 64) { buf(b) += other(b); b += 1 }
    buf
  }

  override def eval(buf: Array[Int]): Any = {
    var sig = 0L
    var b = 0
    while (b < 64) { if (buf(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(64 * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt())
  }

  override def withNewMutableAggBufferOffset(o: Int): SimHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object SimHashAgg {
  private[functions] val A: Array[Long] = Array.tabulate(64)(PortableHash.simhashA)
  private[functions] val B: Array[Long] = Array.tabulate(64)(PortableHash.simhashB)

  /** Aggregate Column: 64-bit SimHash of the (hashed) tokens in the group. */
  def simhash(tokenHash: Column): Column =
    ColumnBridge.column(SimHashAgg(ColumnBridge.expression(tokenHash)).toAggregateExpression())
}
