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

  /** t-closeness audit (Li, Li & Venkatasubramanian 2007) — the leak
    * [[kAnonymize]] and [[lDiversityAudit]] both miss: a quasi-group can
    * be large AND diverse yet still reveal that its members skew toward
    * particular sensitive values. The group-vs-global divergence is the
    * ordered Earth Mover's Distance over the sensitive domain,
    *
    *   t_g = (1/(m−1)) · Σᵢ |Rᵢ|,   Rᵢ = Σ_{j≤i} (p_j − q_j)
    *
    * computed in EXACT cross-multiplied integers: Rᵢ·(n_g·N) =
    * Σ_{j≤i} (c_gj·N − C_j·n_g), accumulated as DECIMAL(38,0) (headroom
    * to ~10¹⁹-row tables), so the flags cannot wobble across engines —
    * the last step is one fixed IEEE chain per group.
    *
    * Shape: one global value histogram (broadcast — sensitive domains
    * are small by definition), one (quasi, value) count, a groups ×
    * values completion join, one cumulative window over ≤ m rows per
    * group. */
  def tClosenessAudit(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, threshold: Double): DataFrame = {
    require(quasiCols.nonEmpty, "tClosenessAudit needs quasi-identifier columns")
    require(threshold > 0 && threshold < 1, s"threshold $threshold outside (0,1)")
    import org.apache.spark.sql.expressions.Window
    val glob = df.groupBy(col(sensitiveCol).as("__v")).agg(count(lit(1)).as("__gcnt"))
    val nTot = df.count()
    val m = glob.count()
    require(m >= 2, "t-closeness needs at least two sensitive values")
    val grp = df.groupBy((quasiCols.map(col) :+ col(sensitiveCol).as("__v")): _*)
      .agg(count(lit(1)).as("__c"))
    val sizes = df.groupBy(quasiCols.map(col): _*).agg(count(lit(1)).as("__ng"))
    val w = Window.partitionBy(quasiCols.map(col): _*).orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val t = sizes.crossJoin(broadcast(glob))
      .join(grp, quasiCols :+ "__v", "left")
      .withColumn("__c", coalesce(col("__c"), lit(0L)))
      .withColumn("__r", sum(
        (col("__c") * nTot - col("__gcnt") * col("__ng")).cast("decimal(38,0)"))
        .over(w))
      .groupBy((quasiCols.map(col) :+ col("__ng")): _*)
      .agg(sum(abs(col("__r"))).cast("decimal(38,0)").as("__S"))
      .withColumn("t", col("__S").cast("double") / lit((m - 1).toDouble) /
        (col("__ng") * lit(nTot)).cast("double"))
    t.select((quasiCols.map(col) :+ col("__ng").cast("long").as("n_rows") :+
      round(col("t"), 6).as("t") :+ (col("t") <= threshold).as("t_ok")): _*)
  }
}
