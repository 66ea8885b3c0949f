package graft.x

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level data profiling: per-column null counts, cardinality, and
  * min/max in a single aggregation job.
  *
  * The profile is the first step of every onboarding/validation pipeline
  * (it feeds the null-key and threshold validators' configuration), so it
  * has to touch the table once: all per-column statistics are computed in
  * ONE `agg()` — one scan, one reduce — then unpivoted driver-free with
  * `stack`. Min/max are surfaced as strings so one schema fits every
  * column type.
  *
  * Cardinality: `exact = true` uses `COUNT(DISTINCT c)` per column, which
  * Catalyst plans via Expand (input duplicated per distinct aggregate) —
  * fine for profiling a sample, wrong for 100 TB. `exact = false` switches
  * to HLL++ `approx_count_distinct`, keeping the whole profile a single
  * streaming pass with constant memory per column.
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      val nd = if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))
      Seq(
        count(col(c)).as(s"${c}__nn"),
        (count(lit(1)) - count(col(c))).as(s"${c}__nulls"),
        nd.as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `${c}__nn`, `${c}__nulls`, `${c}__nd`, `${c}__min`, `${c}__max`"
    }.mkString(", ")
    one.select(expr(
      s"stack(${cols.size}, $stackArgs) AS " +
        "(column_name, non_null, nulls, n_distinct, min_value, max_value)"))
  }
}
