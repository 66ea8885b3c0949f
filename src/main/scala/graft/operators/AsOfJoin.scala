package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: for every left row, attach the most recent right row (by
  * `timeCol`) with the same key whose time is <= the left row's time —
  * the standard point-in-time lookup (trades→quotes, events→dimension
  * versions).
  *
  * Spark has no built-in as-of join; the preferred composition (SURVEY.md
  * §2 custom-operator ladder, option (a)) is union + per-key window scan:
  * tag both sides, union on (key, time), and carry the latest right-row
  * payload forward with `last(_, ignoreNulls = true)` over a per-key
  * time-ordered window. Cost: ONE shuffle on the key (same as any keyed
  * join) and one sort — no range cross-join, no per-row probe; skew follows
  * the key distribution exactly like a regular join, so the usual salting
  * applies. This beats a non-equi join plan (BroadcastNestedLoop + filter +
  * dedup) at any scale where the right side doesn't broadcast.
  */
object AsOfJoin {

  /** @param left      probe side (keeps all rows)
    * @param right     reference side (its latest row at-or-before is attached)
    * @param keys      equi-key columns present on both sides
    * @param timeCol   ordering column present on both sides (same type)
    * @param rightCols right payload columns to attach (null when no right
    *                  row is at-or-before the left row)
    */
  def asOf(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], timeCol: String, rightCols: Seq[String]
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    // the right payload rides as ONE struct: carrying columns independently
    // with per-column last(ignoreNulls) would stitch the "latest" row
    // together from different right rows whenever a payload column is null
    val payloadType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c).copy(name = c)))
    val taggedLeft = left
      .withColumn("__side", lit(1))
      .select(Seq(col("__side")) ++ keys.map(col) ++ Seq(col(timeCol)) ++
        leftCols.filterNot(c => keys.contains(c) || c == timeCol).map(col) :+
        lit(null).cast(payloadType).as("__r"): _*)
    val taggedRight = right
      .withColumn("__side", lit(0))
      .select(Seq(col("__side")) ++ keys.map(col) ++ Seq(col(timeCol)) ++
        leftCols.filterNot(c => keys.contains(c) || c == timeCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightCols.map(col): _*).as("__r"): _*)

    // right rows sort before left rows at equal time (__side 0 < 1), so a
    // right row AT the left row's timestamp is visible to it
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = taggedLeft.unionByName(taggedRight)
      .withColumn("__c", last(col("__r"), ignoreNulls = true).over(w))

    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightCols.map(c => col(s"__c.$c").as(s"right_$c")): _*)
  }
}
