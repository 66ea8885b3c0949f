package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Element-wise MAX of packed HLL register arrays (`array<byte>` of fixed
  * length `m`) — the merge step of [[graft.x.Graph.hyperBall]]'s
  * per-node sketches in their PACKED representation.
  *
  * Why packed: HyperBall's per-round message is "node v absorbs the
  * ball sketch of each out-neighbor". With registers as (node, j, mj)
  * ROWS that join fans out m=256 rows per edge — at 100 TB the shuffle
  * is 256× the edge list. Packed, each edge moves ONE ~256-byte array
  * and this aggregate folds them register-wise, so the round shuffle is
  * |E| slim rows — the exact representation Boldi & Vigna's HyperBall
  * uses (one counter array per node, merge = register max).
  *
  * Determinism: max is commutative/associative/idempotent per register,
  * so the result is independent of partitioning, merge-tree shape, and
  * duplicate delivery — the same property that makes the row-form
  * `max(__mj)` of [[graft.x.Sketches.hllRegisters]] engine-exact, which
  * is why the two representations stay oracle-interchangeable. */
case class HllRegsMaxAgg(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Byte]] {
  require(m >= 1 && m <= 65536, s"register count m out of range: $m")

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "hll_regs_max_agg"

  // strict analysis typing (the MmrSelectExpr/DotProductInt rationale):
  // absorb reads lanes with getByte, so a non-byte array would read
  // type-punned garbage from wider slots instead of failing
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(ByteType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<tinyint> packed registers, got ${other.simpleString}")
    }
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) absorb(buf, v.asInstanceOf[ArrayData])
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (other(i) > buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  private def absorb(buf: Array[Byte], a: ArrayData): Unit = {
    val n = math.min(m, a.numElements())
    var i = 0
    while (i < n) { val v = a.getByte(i); if (v > buf(i)) buf(i) = v; i += 1 }
  }

  override def eval(buf: Array[Byte]): Any =
    UnsafeArrayData.fromPrimitiveArray(buf)

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllRegsMaxAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllRegsMaxAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object HllRegsMaxAgg {
  /** Aggregate Column: register-wise max of packed `array<byte>` register
    * arrays of length `m`. */
  def regsMax(regs: Column, m: Int = 256): Column =
    ColumnBridge.column(
      HllRegsMaxAgg(ColumnBridge.expression(regs), m).toAggregateExpression())
}
