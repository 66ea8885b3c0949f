package graft.x

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Space-filling-curve data layout for multi-dimensional pruning — the
  * missing piece between "partition by one column" and "query by two".
  *
  * A table range-partitioned by `o_orderdate` prunes date predicates but
  * scans everything for a price predicate; z-ordering interleaves the bits
  * of BOTH dimensions into one sort key, so files/partitions become tight
  * hyper-rectangles in (date × price) space and min/max statistics prune
  * EITHER predicate (the same layout idea behind Delta's OPTIMIZE ZORDER
  * and Iceberg's sort orders — here as a plain DataFrame transform any
  * sink can apply before writing).
  *
  * At 100 TB: `zOrder` is one `repartitionByRange` shuffle on the z-value
  * (range boundaries from Spark's reservoir sampling) + an in-partition
  * sort; parquet row-group min/max stats on the original columns then give
  * the pruning. No driver-side state, no global sort.
  *
  * Everything is integer bit arithmetic (`>> & << |`) — deterministic and
  * replayed exactly by the DuckDB oracle.
  */
object Layout {

  /** Morton/z-value: interleave the low `bits` bits of two non-negative
    * integer cell coordinates (x→even bits, y→odd bits). 2·bits output
    * bits, so bits ≤ 31. Codegen'd end-to-end (pure builtin expressions). */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, s"bits $bits out of range")
    // clamp negatives to 0 (ADVICE r2): two's-complement low bits of a
    // negative cell would alias into the TOP of the range — a silent
    // clustering inversion. Clamping keeps the precondition enforced in
    // the expression itself; callers should still anchor/quantize so the
    // clamp never fires (a pile-up at cell 0 is visible, aliasing is not).
    val xc = greatest(lit(0L), x.cast("long"))
    val yc = greatest(lit(0L), y.cast("long"))
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc.bitwiseOR(shiftleft(shiftright(xc, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(yc, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Quantize a numeric column to an integer cell in [0, 2^bits) given a
    * fixed [lo, hi] domain — fixed bounds (not data-dependent min/max) so
    * the mapping is stable across batches and replayable by the oracle. */
  def cell(v: Column, lo: Double, hi: Double, bits: Int = 16): Column = {
    val n = (1L << bits) - 1
    least(lit(n), greatest(lit(0L),
      floor((v - lit(lo)) / lit(hi - lo) * lit(n.toDouble)).cast("long")))
  }

  /** Z-order a frame by two cell columns: one range shuffle on the
    * interleaved key + in-partition sort. Downstream writers inherit the
    * clustered layout (each output file covers a small hyper-rectangle of
    * the two dimensions, so its min/max column stats prune both). */
  def zOrder(df: DataFrame, x: Column, y: Column, bits: Int = 16,
      zCol: String = "z", numPartitions: Int = 0): DataFrame = {
    val withZ = df.withColumn(zCol, zValue(x, y, bits))
    // numPartitions > 0 pins the output file count (AQE otherwise
    // coalesces a small shuffle into one partition — right for data
    // volume, wrong when the point is N clustered files)
    val parted =
      if (numPartitions > 0) withZ.repartitionByRange(numPartitions, col(zCol))
      else withZ.repartitionByRange(col(zCol))
    parted.sortWithinPartitions(zCol)
  }
}
