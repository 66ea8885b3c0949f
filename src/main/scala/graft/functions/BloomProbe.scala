package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Column surface over Spark's own (internal-registry) bloom-filter
  * expressions — `BloomFilterAggregate` to build a filter as a BINARY
  * aggregate and `BloomFilterMightContain` to probe it. Spark ships both
  * for its runtime row-group filters but does not register them as public
  * SQL functions, so this exposes them to the library the same way the
  * custom Catalyst expressions are exposed (via [[ColumnBridge]]).
  *
  * Why this beats a broadcast-sketch UDF: `BloomFilterMightContain` is a
  * codegen'd scalar expression, so a probe-guarded filter stays inside
  * whole-stage codegen instead of crossing a ScalaUDF boundary per row.
  * The filter itself rides a scalar subquery — computed once, reused by
  * every probe site (ReuseSubquery), rendered compactly in explain output,
  * and shipped with the (torrent-broadcast) task binary.
  *
  * Sizing: `BloomFilterAggregate` clamps its parameters to
  * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` /
  * `.maxNumBits` (defaults 4e6 items / 67e6 bits) — raise those session
  * confs for a 10⁸–10⁹-entry blocklist filter.
  */
object BloomProbe {

  /** Optimal bit count for `n` items at false-positive rate `p` —
    * the standard ⌈−n·ln p ∕ (ln 2)²⌉ formula (Bloom 1970). */
  def optimalNumBits(n: Long, p: Double): Long = {
    require(n > 0 && p > 0 && p < 1, s"need n > 0, 0 < p < 1; got n=$n p=$p")
    math.ceil(-n * math.log(p) / (math.log(2) * math.log(2))).toLong
  }

  /** Aggregate Column building a bloom filter (BINARY) over `child`. */
  def bloomAgg(child: Column, expectedItems: Long, fpp: Double): Column =
    ColumnBridge.column(
      new BloomFilterAggregate(ColumnBridge.expression(child),
        Literal(expectedItems), Literal(optimalNumBits(expectedItems, fpp)))
        .toAggregateExpression())

  /** Probe Column: membership of `value` in the one-row, one-column
    * BINARY bloom frame `bloom1Row` (built with [[bloomAgg]]), attached
    * as a scalar subquery — the shape `BloomFilterMightContain` requires.
    * NULL value probes yield NULL, like every null-intolerant expression.
    *
    * CALLER CONTRACT — build the bloom from an INDEPENDENT plan: the
    * bloom frame's analyzed plan is embedded verbatim as the subquery, so
    * if it shares a plan subtree with the frame being probed, the same
    * attribute exprIds appear both outside and inside the subquery and
    * analysis can misresolve or trip duplicate-attribute checks (Spark's
    * own InjectRuntimeFilter deduplicates attributes for exactly this
    * reason). Derive the bloom from its own `spark.read`/`spark.table`
    * lineage — the natural shape for a blocklist anyway. Probing the
    * SAME TABLE the bloom was built from is fine as long as the
    * DataFrames are separate reads (fresh exprIds), e.g. two
    * `spark.table(...)` calls; what breaks is literally reusing one
    * DataFrame object (or a transform of it) on both sides. */
  def mightContain(bloom1Row: DataFrame, value: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      ScalarSubquery(bloom1Row.queryExecution.analyzed),
      ColumnBridge.expression(value)))
}
