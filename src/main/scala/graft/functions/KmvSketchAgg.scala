package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) theta sketch as a Spark aggregate: the k
  * SMALLEST distinct hash values seen, as a sorted `array<bigint>` — the
  * bottom-k construction behind the DataSketches theta family
  * (Bar-Yossef et al. 2002; Beyer et al. 2007, "On synopses for
  * distinct-value estimation under multiset operations").
  *
  * Why this sketch and not HLL: the k-min set supports SET ALGEBRA.
  * Distinct-count comes from `(k-1)/θ_k` ([[KmvSketchAgg.estimate]]), but
  * union/intersection/Jaccard across sketches ([[KmvSketchAgg.jaccard]])
  * come from plain array ops on the sketch columns — cross-segment
  * audience overlap and corpus-contamination estimates that register-based
  * HLL structurally cannot answer. Sketches are data: store them per
  * batch/segment as columns, merge later by re-aggregating
  * (`kmv_sketch_agg(exploded hashes)` — bottom-k of a union of bottom-k
  * sets is the bottom-k of the union, so merging is lossless by
  * construction).
  *
  * Fully deterministic: the input is a caller-supplied hash (use
  * [[PolyHash56]] for oracle parity — 55-bit, non-negative), and "k
  * smallest distinct values" is a pure function of the input SET — no RNG,
  * no insertion-order dependence, identical under any partitioning, merge
  * tree, or engine. The oracle replays it as `ORDER BY h LIMIT k` per
  * group; estimates are single IEEE divisions of identical operands.
  *
  * At 100 TB: exact distinct shuffles one row per distinct value; this
  * moves ≤ k longs per map task per group with map-side partial merge.
  * Update is O(log k) against a sorted set with an early reject (`h >=
  * max` once full — the common case after warm-up is one comparison). */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[mutable.TreeSet[Long]] {
  require(k > 1, "kmv_sketch_agg needs k > 1")

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch_agg"

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  override def update(buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) observe(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: mutable.TreeSet[Long], other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach(observe(buf, _))
    buf
  }

  private def observe(buf: mutable.TreeSet[Long], h: Long): Unit =
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.lastKey && buf.add(h)) { buf.remove(buf.lastKey); () }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray[Any]) // TreeSet iterates ascending

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = mutable.TreeSet.empty[Long]
    var i = 0
    while (i < n) { buf.add(bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object KmvSketchAgg {
  import org.apache.spark.sql.functions._

  /** 2^55 as an exact double — [[PolyHash56]]'s hash-space size. */
  val HashSpace: Double = 3.6028797018963968e16

  /** LCG multiplier/increment for [[spread55]] (Knuth/MMIX constants). */
  val SpreadA: Long = 2862933555777941757L
  val SpreadB: Long = 3037000493L

  /** Bijective spread of a 55-bit hash over the full [0, 2^55) range:
    * `(h·A + B) mod 2^55` with A odd — multiplication by an odd constant
    * is a bijection on Z_2^55, so distinctness is preserved while the
    * Weyl-style equidistribution fixes the one property the ESTIMATOR
    * needs and a bare polynomial hash lacks: short strings poly-hash far
    * below 2^55 (a 4-char key reaches only ~131^4 ≈ 2^28), which would
    * make `(k-1)·2^55/θ_k` overestimate by orders of magnitude. DECIMAL
    * intermediates keep the 74-bit product exact; the oracle mirrors it
    * in HUGEINT — same integers, same result. */
  def spread55(h: Column): Column =
    ((h.cast("decimal(18,0)") * lit(java.math.BigDecimal.valueOf(SpreadA)) +
      lit(java.math.BigDecimal.valueOf(SpreadB))) %
      lit(java.math.BigDecimal.valueOf(1L << 55))).cast("long")

  /** The hash KMV callers should feed [[kmvSketch]]: portable 55-bit
    * [[PolyHash56]], spread to uniformity by [[spread55]]. */
  def hash55(value: Column): Column = spread55(PolyHash56(value))

  /** Aggregate Column: KMV sketch (sorted `array<bigint>`, ≤ k entries) of
    * a 55-bit hash column. */
  def kmvSketch(hash: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSketchAgg(ColumnBridge.expression(hash), k).toAggregateExpression())

  /** Distinct-count estimate from a KMV sketch: exact size below k
    * (sketch = the whole value set), else `(k-1) · 2^55 / θ_k` with θ_k
    * the k-th smallest hash — one IEEE multiply + divide of identical
    * operands on any engine, so even the ESTIMATE is oracle-exact. */
  def estimate(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(HashSpace) /
        element_at(sketch, k).cast("double"))

  /** Jaccard estimate between two KMV sketches over the SAME hash
    * function: ρ = |{bottom-k of a∪b} ∩ a ∩ b| / |bottom-k of a∪b|
    * (Beyer et al. 2007). Plain codegen'd array ops — no re-scan of the
    * data that built the sketches. */
  def jaccard(a: Column, b: Column, k: Int): Column = {
    val u = slice(array_sort(array_distinct(concat(a, b))), 1, k)
    size(array_intersect(array_intersect(u, a), b)).cast("double") /
      size(u).cast("double")
  }

  /** Intersection-cardinality estimate: Jaccard × union estimate, the
    * standard theta-sketch composition. */
  def intersectionEstimate(a: Column, b: Column, k: Int): Column =
    jaccard(a, b, k) *
      estimate(slice(array_sort(array_distinct(concat(a, b))), 1, k), k)
}
