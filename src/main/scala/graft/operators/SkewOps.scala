package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffles whose key distribution is pathological
  * (SURVEY.md §2/§4 scale notes — "skewed keys → salting or AQE skew-join").
  * AQE's skew-join handles sort-merge joins it can observe at runtime;
  * these helpers cover the cases it can't: broadcast-ineligible joins where
  * one side must be replicated, and aggregations where one key would
  * otherwise pin a single reducer.
  */
object SkewOps {

  private def saltCol(df: DataFrame, n: Int): Column =
    pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(n))

  /** Salted equi-join: the large (skewed) side gets a content-derived salt
    * in [0, saltFactor); the small side is replicated saltFactor× so every
    * (key, salt) pair still meets its match. The shuffle then spreads each
    * hot key over saltFactor reducers at the cost of replicating the small
    * side's rows — the classic trade when the small side is too big to
    * broadcast outright but skew would otherwise serialize one executor. */
  def saltedJoin(
      large: DataFrame, small: DataFrame, keys: Seq[String],
      saltFactor: Int, joinType: String = "inner"
  ): DataFrame = {
    // outer-preserving the REPLICATED side would emit every unmatched
    // small-side row saltFactor times; only join types that keep at most
    // the large side's unmatched rows are sound under replication
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi")
      .contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left/left_semi joins, got '$joinType'")
    val saltedLarge = large.withColumn("__salt", saltCol(large, saltFactor))
    val saltedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLarge
      .join(saltedSmall, keys :+ "__salt", joinType)
      .drop("__salt")
  }

  /** Two-phase salted aggregation for algebraic aggregates: phase 1 groups
    * by (keys, salt) so a hot key spreads across reducers, phase 2 combines
    * the partials. `partials` maps output column name → (phase-1 agg of an
    * input column, phase-2 combiner of the partial). sum/count/min/max are
    * exposed below. */
  def saltedAgg(
      df: DataFrame, keys: Seq[String], saltFactor: Int,
      partials: Seq[(String, (Column, String => Column))]
  ): DataFrame = {
    val salted = df.withColumn("__salt", saltCol(df, saltFactor))
    val phase1 = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head._2._1.as("__p_" + partials.head._1),
        partials.tail.map { case (n, (a, _)) => a.as("__p_" + n) }: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(partials.head._2._2("__p_" + partials.head._1).as(partials.head._1),
        partials.tail.map { case (n, (_, c)) => c("__p_" + n).as(n) }: _*)
  }

  def sumOf(c: Column): (Column, String => Column) = (sum(c), p => sum(col(p)))
  def countAll: (Column, String => Column) = (count(lit(1)), p => sum(col(p)))
  def minOf(c: Column): (Column, String => Column) = (min(c), p => min(col(p)))
  def maxOf(c: Column): (Column, String => Column) = (max(c), p => max(col(p)))
}
