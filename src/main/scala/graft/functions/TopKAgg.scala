package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-group top-k as a bounded-heap aggregate — the sort-free,
  * composable alternative to the `row_number() OVER (PARTITION BY g
  * ORDER BY v DESC) <= k` window pattern.
  *
  * Spark's optimizer already rescues the adjacent rank-filter case from
  * the naive shuffle-everything plan: InferWindowGroupLimit inserts a
  * partial WindowGroupLimit map-side, so both formulations ship at most
  * k rows per (map task × group). What the window path still pays — and
  * this aggregate does not — is SORTS: WindowGroupLimit requires each
  * map partition sorted on (group, ord) before it can limit, and the
  * final window sorts again after the exchange; this aggregate is a
  * hash-grouped O(n log k) heap inside ObjectHashAggregate, no sort on
  * either side. It also composes where the optimizer's rank-filter
  * inference cannot reach: the top-k shortlist lands in the SAME
  * groupBy as sibling aggregates (count/sum/avg in one pass), and the
  * collapsed `array<struct>` form is directly storable as a per-group
  * shortlist column. `merge` re-offers the other buffer's entries into
  * the heap, so arbitrary combine trees (partial → partial-merge →
  * final) preserve the exact answer; top-k selection is a mergeable
  * summary in the Agarwal et al. "Mergeable Summaries" sense, with zero
  * error.
  *
  * Determinism: entries rank by (ord DESC, item ASC) — the item
  * tie-break makes the selected set and its order a pure function of the
  * data, independent of partitioning, which is what lets the x144 oracle
  * hash-compare against DuckDB's window formulation row for row.
  *
  * Null handling: rows with a null `ord` or null `item` are skipped
  * (SQL aggregates ignore nulls; a null ordering key has no rank).
  *
  * `item` may be any integral/string column (`LongType` buffer for
  * integrals, `StringType` otherwise is rejected early — see `require`);
  * `ord` is cast to double by the [[TopKAgg.topKBy]] helper. Evaluation
  * emits `array<struct<ord double, item T>>` sorted best-first; callers
  * explode it back to rows.
  */
case class TopKAgg(
    ord: Expression,
    item: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[TopKAgg.Buffer] {
  require(k > 0, "top_k_by k must be positive")

  import TopKAgg.{Buffer, Entry}

  // dataType is unavailable on unresolved children, so type contracts
  // live here (invoked by the analyzer post-resolution), not in require.
  override def checkInputDataTypes(): TypeCheckResult =
    if (ord.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"top_k_by ordering column must be double, got ${ord.dataType}")
    else if (item.dataType != LongType && item.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"top_k_by item column must be long or string, got ${item.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  private def itemIsLong: Boolean = item.dataType == LongType

  override def children: Seq[Expression] = Seq(ord, item)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ord", DoubleType, nullable = false),
    StructField("item", item.dataType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_by"

  override def createAggregationBuffer(): Buffer = new Buffer(k, itemIsLong)

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val o = ord.eval(input)
    if (o != null) {
      val it = item.eval(input)
      if (it != null) {
        val v = it match {
          case u: UTF8String => u.toString // detach from the row's reused buffer
          case other => other
        }
        buf.offer(Entry(o.asInstanceOf[Double], v))
      }
    }
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = {
    other.heap.foreach(buf.offer)
    buf
  }

  override def eval(buf: Buffer): Any = {
    val sorted = buf.entriesBestFirst
    new GenericArrayData(sorted.map { e =>
      val itemVal: Any = e.item match {
        case s: String => UTF8String.fromString(s)
        case other => other
      }
      new GenericInternalRow(Array[Any](e.ord, itemVal))
    }.toArray[Any])
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    val entries = buf.heap.toArray
    if (itemIsLong) {
      val bb = java.nio.ByteBuffer.allocate(4 + entries.length * 16)
      bb.putInt(entries.length)
      entries.foreach { e => bb.putDouble(e.ord); bb.putLong(e.item.asInstanceOf[Long]) }
      bb.array()
    } else {
      val bytes = entries.map(e => e.item.asInstanceOf[String].getBytes("UTF-8"))
      val bb = java.nio.ByteBuffer.allocate(
        4 + entries.length * 12 + bytes.map(_.length).sum)
      bb.putInt(entries.length)
      entries.indices.foreach { i =>
        bb.putDouble(entries(i).ord); bb.putInt(bytes(i).length); bb.put(bytes(i))
      }
      bb.array()
    }
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Buffer(k, itemIsLong)
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val o = bb.getDouble()
      val it: Any =
        if (itemIsLong) bb.getLong()
        else { val b = new Array[Byte](bb.getInt()); bb.get(b); new String(b, "UTF-8") }
      buf.offer(Entry(o, it))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(ord = c(0), item = c(1))
}

object TopKAgg {
  /** One candidate: ordering value + carried item (Long or String). */
  final case class Entry(ord: Double, item: Any)

  /** k-bounded selection state. `heap` is a worst-on-top priority queue
    * so a full buffer evicts in O(log k) only when the newcomer beats the
    * current worst; a losing newcomer costs one comparison. */
  final class Buffer(k: Int, itemIsLong: Boolean) {
    private def itemCompare(a: Any, b: Any): Int =
      if (itemIsLong) java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
      else a.asInstanceOf[String].compareTo(b.asInstanceOf[String])

    /** Ranks (ord DESC, item ASC)-worse entries as GREATER, so the queue
      * head is the eviction candidate. */
    private val worstFirst: Ordering[Entry] = (a: Entry, b: Entry) => {
      val c = java.lang.Double.compare(b.ord, a.ord)
      if (c != 0) c else itemCompare(a.item, b.item)
    }

    val heap: mutable.PriorityQueue[Entry] = mutable.PriorityQueue.empty(worstFirst)

    /** (ord DESC, item ASC) — ascending sort under `worstFirst` ranks the
      * LEAST-worst (= best) entry first. */
    def entriesBestFirst: Array[Entry] = heap.toArray.sorted(worstFirst)

    def offer(e: Entry): Unit =
      if (heap.size < k) heap.enqueue(e)
      else if (worstFirst.compare(e, heap.head) < 0) { // e beats current worst
        heap.dequeue(); heap.enqueue(e)
      }
  }

  /** Aggregate Column: the k best `(ord, item)` pairs of the group by
    * (ord DESC, item ASC), as `array<struct<ord double, item T>>` sorted
    * best-first. Exact, mergeable, and map-side combining — per map task
    * only k entries per group reach the shuffle, vs. the whole group for
    * the `row_number()` window pattern. */
  def topKBy(ord: Column, item: Column, k: Int): Column = {
    val ordExpr = Cast(ColumnBridge.expression(ord), DoubleType)
    ColumnBridge.column(
      TopKAgg(ordExpr, ColumnBridge.expression(item), k).toAggregateExpression())
  }
}
