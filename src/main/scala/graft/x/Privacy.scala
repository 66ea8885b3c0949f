package graft.x

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy-governance operators for released datasets (SURVEY.md §2.9):
  * k-anonymity suppression and l-diversity auditing — the checks a
  * training-data release runs after PII scrubbing ([[TextAnalysis.redactPii]]
  * / [[TextAnalysis.piiExtents]]) to bound re-identification risk from the
  * STRUCTURED columns that survive it (language, source, geography, …).
  */
object Privacy {

  /** k-anonymity suppression: every row whose quasi-identifier combination
    * occurs fewer than `k` times in the dataset gets those columns
    * generalized to `mask`, so no released row is attributable to a group
    * smaller than k (Sweeney 2002). Non-quasi columns pass through; a
    * `suppressed` flag makes the redaction auditable.
    *
    * Plan shape: group sizes come from a groupBy with map-side partial
    * counts, joined back on the quasi key — deliberately NOT a window
    * count, which would buffer each quasi-group in one task and die on the
    * dominant-group skew this operator exists to find. The join is
    * co-partitioned with the count shuffle (AQE broadcasts the count side
    * when small); the masking itself is a narrow projection.
    */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String], k: Long,
      mask: String = "*"): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymize needs at least one quasi-identifier column")
    require(k >= 1, s"kAnonymize needs k >= 1, got $k")
    val counts = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__qn"))
    val masked = quasiCols.foldLeft(df.join(counts, quasiCols)) { (d, c) =>
      d.withColumn(c, when(col("__qn") < k, lit(mask)).otherwise(col(c).cast("string")))
    }
    masked.withColumn("suppressed", col("__qn") < k).drop("__qn")
  }

  /** l-diversity audit: per quasi-identifier group, how many DISTINCT
    * sensitive values appear (Machanavajjhala et al. 2007) — a k-anonymous
    * group where everyone shares one sensitive value still leaks it; this
    * surfaces those groups before release. One count-distinct aggregate
    * keyed by the quasi columns; output is group-cardinality-sized.
    */
  def lDiversityAudit(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "lDiversityAudit needs at least one quasi-identifier column")
    require(l >= 1, s"lDiversityAudit needs l >= 1, got $l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("l_ok", col("n_sensitive") >= l)
  }
}
