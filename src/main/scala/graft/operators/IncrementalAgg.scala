package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.VersionedParquet

/** Incrementally-maintained aggregate table (materialized-view refresh).
  *
  * The reference's pipelines recompute their aggregation steps from the
  * full source every scheduled run (batch-incremental via re-run,
  * /root/reference/deploy.yaml:13). At 100 TB a daily full recompute is
  * the single biggest avoidable cost in the whole pipeline: the input
  * grows by a sliver, the answer changes by a sliver, but the job pays
  * for everything. This operator maintains `SUM`/`COUNT` aggregates as a
  * delta-refresh over [[VersionedParquet]]'s change feed instead:
  *
  *   - reads ONLY the commits since the last refresh (`readChanges`),
  *   - folds deletes as negative contributions (sum/count form an
  *     abelian group, so retraction is exact — this is why the operator
  *     restricts itself to sum/count; min/max are only semigroups and
  *     need a recompute on delete),
  *   - combines the delta with the previous state in one outer join,
  *   - drops groups whose live row count reaches zero,
  *   - commits the new state back as a versioned table — so the
  *     aggregate itself gets snapshot isolation and time travel.
  *
  * The refresh high-water mark rides IN the state rows (`_src_version`):
  * state and watermark commit atomically together, so a crash between
  * "state written" and "watermark written" cannot double-apply a delta.
  * An empty/missing state falls back to replaying the full feed from
  * version −1 onto nothing — which rebuilds the exact state, so recovery
  * is always "just call refresh again".
  *
  * Scale shape: the source is never rescanned — only delta files are
  * read; the join shuffles (state + delta) on the group keys, both sides
  * keyed identically. Average-type metrics derive at read time
  * (`sum/cnt`), never stored.
  */
object IncrementalAgg {

  val SrcVersion = "_src_version"

  /** Current high-water mark of `statePath` (−1 if absent/empty). */
  def watermark(spark: SparkSession, statePath: String): Long =
    if (VersionedParquet.versions(statePath).isEmpty) -1L
    else {
      val st = VersionedParquet.read(spark, statePath)
      if (st.isEmpty) -1L
      else st.agg(max(col(SrcVersion))).head().getLong(0)
    }

  /** Refresh sum/count aggregates of `sourcePath` grouped by `keyCols`
    * into `statePath`. Returns the source version the state now reflects
    * (no-op when already current). */
  def refresh(spark: SparkSession, sourcePath: String, statePath: String,
      keyCols: Seq[String], sumCols: Seq[String]): Long = {
    require(keyCols.nonEmpty, "incremental aggregate needs group keys")
    val latest = VersionedParquet.versions(sourcePath).max
    val from = watermark(spark, statePath)
    if (latest <= from) return from

    val changes = VersionedParquet.readChanges(spark, sourcePath, from, Some(latest))
    val sign = when(col("_change_type") === "insert", lit(1L)).otherwise(lit(-1L))
    val deltaAggs: Seq[Column] =
      sum(sign).as("cnt") +:
        sumCols.map(c => sum(sign * col(c)).as(s"sum_$c"))
    val delta = changes.groupBy(keyCols.map(col): _*).agg(deltaAggs.head, deltaAggs.tail: _*)

    val combined =
      if (from < 0L) delta
      else {
        val prev = VersionedParquet.read(spark, statePath)
        val valueCols = "cnt" +: sumCols.map(c => s"sum_$c")
        val p = prev.select((keyCols ++ valueCols).map(col): _*)
          .toDF(keyCols ++ valueCols.map("p_" + _): _*)
        val d = delta.toDF(keyCols ++ valueCols.map("d_" + _): _*)
        p.join(d, keyCols, "full_outer")
          .select(keyCols.map(col) ++ valueCols.map(v =>
            (coalesce(col(s"p_$v"), lit(0L)) + coalesce(col(s"d_$v"), lit(0L))).as(v)): _*)
      }
    val next = combined
      .filter(col("cnt") > 0)
      .withColumn(SrcVersion, lit(latest))
    VersionedParquet.write(next, statePath, "overwrite")
    latest
  }
}
