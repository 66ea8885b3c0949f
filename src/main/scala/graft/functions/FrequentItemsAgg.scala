package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-items (heavy-hitter) sketch as a Spark aggregate — the
  * Misra-Gries counter summary, the same structure DataSketches ships as
  * its frequent-items sketch and the dual of Space-Saving. Single pass,
  * bounded memory (`capacity` = m counters), for streams whose vocabulary
  * is far too large to count exactly (URLs, user agents, IPs, shingles).
  *
  * The summary tracks at most m `(item, count)` counters plus the
  * observation total n. Evaluation emits, per tracked item,
  * `(term, count, error)` with `error = floor(n / (m+1))` and the
  * guarantees (Misra-Gries; Agarwal et al., "Mergeable Summaries"):
  *
  *   count >= true >= count - error        (two-sided interval)
  *   every item with true > n/(m+1) is PRESENT in the summary
  *
  * — and, the reason this formulation is the right one for Spark: both
  * guarantees are PROVEN to survive arbitrary merge trees. `merge` is
  * the mergeable-summaries construction (sum counters, then subtract the
  * (m+1)-th largest combined count from every counter and drop the
  * non-positive ones), so map-side combine and the final partition-
  * summary accumulation degrade nothing. (A naive Space-Saving merge
  * loses the presence threshold by a fan-in-dependent factor — that is
  * why the sketch is Misra-Gries inside.) The x70 oracle contract checks
  * both guarantees end-to-end against exact counts on a 32-partition
  * execution.
  *
  * At 100 TB: the exact alternative shuffles one row per DISTINCT item
  * ([[graft.x.TextAnalysis.topTermsPerGroup]] is fine when the
  * vocabulary fits a shuffle; an open-vocabulary stream's does not).
  * This sketch moves m counters per map task, period. Updates are
  * amortized O(1): instead of the classic per-miss decrement sweep, the
  * map grows to 2m and overflow triggers ONE truncation per ≥m
  * insertions (the DataSketches purge strategy) — and since that
  * truncation is exactly the merge's, every operation stays an instance
  * of the mergeable-summaries merge, bounds unchanged (delaying
  * truncation only lowers error).
  *
  * Summary CONTENT below the n/(m+1) threshold legitimately depends on
  * the partition split; consumers rely on the guaranteed items and the
  * [count-error, count] interval, never on tail membership. Output order
  * is deterministic given content: (count desc, term asc). */
case class FrequentItemsAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[FrequentItemsAgg.Summary] {
  require(capacity > 0, "frequent_items_agg capacity must be positive")

  import FrequentItemsAgg.Summary

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("count", LongType, nullable = false),
    StructField("error", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "frequent_items_agg"

  override def createAggregationBuffer(): Summary =
    new Summary(0L, mutable.HashMap.empty)

  override def update(buf: Summary, input: InternalRow): Summary = {
    val v = child.eval(input)
    if (v != null) {
      buf.n += 1
      FrequentItemsAgg.mgObserve(buf.counts, v.asInstanceOf[UTF8String].toString, capacity)
    }
    buf
  }

  override def merge(buf: Summary, other: Summary): Summary = {
    if (other.n == 0) return buf
    buf.n += other.n
    other.counts.foreach { case (k, c) =>
      buf.counts.update(k, buf.counts.getOrElse(k, 0L) + c)
    }
    if (buf.counts.size > capacity * 2) FrequentItemsAgg.mgTruncate(buf.counts, capacity)
    buf
  }

  override def eval(buf: Summary): Any = {
    // the working map runs to 2m between purges; the OUTPUT honors the
    // m-counter contract
    if (buf.counts.size > capacity) FrequentItemsAgg.mgTruncate(buf.counts, capacity)
    val err = buf.n / (capacity + 1)
    val sorted = buf.counts.toSeq.sortBy { case (k, c) => (-c, k) }
    new GenericArrayData(sorted.map { case (k, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(k), c + err, err))
    }.toArray[Any])
  }

  override def serialize(buf: Summary): Array[Byte] = {
    val entries = buf.counts.toSeq.map { case (k, c) => (k.getBytes("UTF-8"), c) }
    val bb = java.nio.ByteBuffer.allocate(
      8 + 4 + entries.map(e => 4 + e._1.length + 8).sum)
    bb.putLong(buf.n)
    bb.putInt(entries.size)
    entries.foreach { case (kb, c) => bb.putInt(kb.length); bb.put(kb); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Summary = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getLong()
    val sz = bb.getInt()
    val counts = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < sz) {
      val kb = new Array[Byte](bb.getInt()); bb.get(kb)
      counts.update(new String(kb, "UTF-8"), bb.getLong())
      i += 1
    }
    new Summary(n, counts)
  }

  override def withNewMutableAggBufferOffset(o: Int): FrequentItemsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FrequentItemsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object FrequentItemsAgg {
  /** Mutable aggregation state: observation total + the m-counter map. */
  final class Summary(var n: Long, val counts: mutable.HashMap[String, Long])

  /** One Misra-Gries observation: tracked items increment; a newcomer
    * inserts at 1 and an overflow past 2m triggers one [[mgTruncate]] —
    * amortized O(1) per observation. Shared by the batch aggregate and
    * the stateful-streaming job ([[graft.streaming.StreamingJobs
    * .statefulHeavyHitters]]), so there is exactly one sketch
    * implementation to trust. */
  def mgObserve(counts: mutable.HashMap[String, Long], item: String,
      capacity: Int): Unit =
    counts.get(item) match {
      case Some(c) => counts.update(item, c + 1)
      case None =>
        counts.update(item, 1L)
        if (counts.size > capacity * 2) mgTruncate(counts, capacity)
    }

  /** Subtract the (m+1)-th largest count from every counter and drop the
    * non-positive ones — at most m counters can exceed that value, so
    * the survivor set fits by construction. This is the ONE truncation
    * primitive everything uses (merge, update overflow, eval, streaming
    * snapshot), which keeps the proof obligations to a single
    * operation. */
  def mgTruncate(counts: mutable.HashMap[String, Long], capacity: Int): Unit = {
    val v = counts.valuesIterator.toArray.sortBy(-_).apply(capacity)
    counts.mapValuesInPlace((_, c) => c - v)
    counts.filterInPlace((_, c) => c > 0)
    ()
  }

  /** Aggregate Column: the m-counter frequent-items summary of `item`, as
    * array<struct<term, count, error>> sorted by (count desc, term) —
    * count is an upper bound on the item's true frequency, count - error
    * a lower bound, and every item with true frequency > n/(m+1) is
    * guaranteed present. */
  def frequentItems(item: Column, capacity: Int): Column =
    ColumnBridge.column(
      FrequentItemsAgg(ColumnBridge.expression(item), capacity).toAggregateExpression())
}
