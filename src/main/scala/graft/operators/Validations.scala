package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Phase-2 validation operators (reference: /root/reference/spark.json:40-52,
  * threshold gate spark.json:7, reconciliation spark.json:80). Each validator
  * returns (good, bad) so the caller can route `bad` to the error sink
  * (spark.json:97-101) with an `error_reason` column.
  *
  * Scale notes: nullKeyCheck is a pure narrow filter (no shuffle).
  * dedup shuffles once on the primary keys — unavoidable for keyed dedup —
  * and uses `row_number` so it is one hash-partitioned sort, not a self-join.
  */
object Validations {

  final case class Routed(good: DataFrame, bad: DataFrame)

  /** V1 null-key validation (spark.json:43-46): rows with NULL in ANY
    * declared primary key are invalid. */
  def nullKeyCheck(df: DataFrame, primaryKeys: Seq[String]): Routed = {
    val anyNull: Column = primaryKeys.map(col(_).isNull).reduce(_ || _)
    Routed(
      good = df.filter(!anyNull),
      bad = df.filter(anyNull).withColumn("error_reason", lit("null_primary_key"))
    )
  }

  /** V2 duplicate-record validation (spark.json:47-52): among rows sharing
    * `primaryKeys`, keep the first by `orderByCols` DESC; rest are invalid.
    * One shuffle on the keys; map-side nothing to combine (row-level op). */
  def dedup(df: DataFrame, primaryKeys: Seq[String], orderByCols: Seq[String]): Routed = {
    val w = Window
      .partitionBy(primaryKeys.map(col): _*)
      .orderBy(orderByCols.map(col(_).desc): _*)
    val rn = df.withColumn("__rn", row_number().over(w))
    Routed(
      good = rn.filter(col("__rn") === 1).drop("__rn"),
      bad = rn.filter(col("__rn") > 1).drop("__rn")
        .withColumn("error_reason", lit("duplicate_record"))
    )
  }

  /** Referential-integrity validation (extension of the phase-2 family):
    * child rows whose foreign-key tuple has no match in `parent` are
    * invalid. SQL FK semantics: a NULL anywhere in the FK tuple is NOT a
    * violation (route those through [[nullKeyCheck]] if they should be).
    *
    * Shape: one anti/semi join pair against the DISTINCT parent keys —
    * dimension-sized parents broadcast, so the fact side is map-side only;
    * a huge parent degrades to one co-partitioned shuffle join. */
  def refIntegrityCheck(child: DataFrame, parent: DataFrame,
      fk: Seq[(String, String)]): Routed = {
    val pkeys = parent.select(fk.map { case (_, p) => col(p) }: _*).distinct()
    val cond = fk.map { case (c, p) => child(c) === pkeys(p) }.reduce(_ && _)
    val anyNull = fk.map { case (c, _) => col(c).isNull }.reduce(_ || _)
    val nonNull = child.filter(!anyNull)
    Routed(
      good = child.filter(anyNull).unionByName(nonNull.join(pkeys, cond, "left_semi")),
      bad = nonNull.join(pkeys, cond, "left_anti")
        .withColumn("error_reason", lit("fk_orphan"))
    )
  }

  /** Accepted-values validation: rows whose `column` is outside the
    * declared domain are invalid (NULL counts as invalid here — an
    * unexpected NULL in an enum column is exactly what this check is
    * for). Pure narrow filter, no shuffle. */
  def acceptedValues(df: DataFrame, column: String, allowed: Seq[String]): Routed = {
    val ok = col(column).isin(allowed: _*)
    Routed(
      good = df.filter(ok),
      bad = df.filter(!ok || col(column).isNull)
        .withColumn("error_reason", lit(s"unexpected_value:$column"))
    )
  }

  /** V4 threshold gate (spark.json:7, e.g. "30%"): abort when the invalid
    * fraction exceeds the limit. Counts force one action each — callers
    * should pass already-persisted frames when both counts are needed. */
  def thresholdGate(goodCount: Long, badCount: Long, limit: Double): Unit = {
    val total = goodCount + badCount
    if (total > 0 && badCount.toDouble / total > limit)
      throw new IllegalStateException(
        f"validation threshold exceeded: $badCount/$total invalid (${badCount.toDouble / total}%.3f > $limit%.3f)")
  }

  /** V3 transformed-count validation (spark.json:66). */
  def countValidation(df: DataFrame, minRows: Long): Long = {
    val n = df.count()
    if (n < minRows)
      throw new IllegalStateException(s"count validation failed: $n rows < expected $minRows")
    n
  }

  /** V5 reconciliation (spark.json:80): re-read the written target and
    * compare row count (and optionally an order-independent content
    * checksum via xor of row hashes) against what we intended to write. */
  def reconcile(written: DataFrame, target: DataFrame, checksum: Boolean = false): Boolean = {
    if (written.count() != target.count()) return false
    if (!checksum) return true
    def sig(df: DataFrame): Long = {
      val cols = df.columns.sorted.toIndexedSeq.map(col)
      df.select(xxhash64(cols: _*).as("h"))
        .agg(expr("bit_xor(h)").as("s")) // xor: order-independent, overflow-free
        .collect()(0).getLong(0)
    }
    sig(written) == sig(target)
  }
}
