package graft.x

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed curation pipeline (SURVEY.md §2.9): the sequence a
  * training-data team actually runs, expressed as ONE operator over the
  * library's own stages so the whole flow is oracle-checkable end-to-end —
  *
  *   1. quality gate — token-level repetition rules
  *      ([[TextAnalysis.repetitionStats]]) plus a minimum token count;
  *   2. exact dedup — whitespace-normalized content fingerprint, smallest
  *      id kept per class ([[Dedup.exact]]);
  *   3. near-dup collapse — n-gram Jaccard pairs → connected components,
  *      keep each component's representative ([[Dedup.ngramJaccardPairs]],
  *      [[Dedup.connectedComponents]]);
  *   4. deterministic split — portable hash buckets
  *      ([[Sampling.trainTestSplit]]).
  *
  * Stage order is load-bearing: the quality gate runs FIRST so junk never
  * pays dedup cost; exact dedup runs before the pairwise stage so mass
  * duplicates collapse in one hash aggregation instead of flooding the
  * co-shingle join; the split is last so its fractions apply to the
  * retained corpus. After keep-one-per-cluster the survivors contain no
  * near-dup pairs, so the per-document split cannot leak a near-copy
  * across the boundary (the x57 operator exists for pipelines that keep
  * duplicates and still need leakage-safe splits).
  *
  * Shape at 100 TB: narrow filters + hash aggregations keyed by content
  * fingerprint / document id; the only pairwise machinery is the capped
  * co-shingle join inherited from [[Dedup.ngramJaccardPairs]] — already
  * bounded by the derived doc-frequency cap and running on the smaller
  * post-gate, post-exact-dedup corpus. */
object Curation {

  def curate(docs: DataFrame, textCol: String, idCol: String,
      minTokens: Long = 5L,
      minUniqRatio: Double = 0.3, maxTopShare: Double = 0.2,
      jaccardN: Int = 3, jaccardThreshold: Double = 0.5,
      testFraction: Double = 0.1, validationFraction: Double = 0.1,
      staging: graft.util.Staging = graft.util.Staging.LocalCheckpoint): DataFrame = {
    val (_, _, nearKept) = stages(docs, textCol, idCol, minTokens,
      minUniqRatio, maxTopShare, jaccardN, jaccardThreshold, staging)
    // 4. deterministic split over the retained corpus
    Sampling.trainTestSplit(nearKept, idCol, testFraction, validationFraction)
  }

  /** Per-stage retention audit for [[curate]] — the lineage surface a
    * curation run reports: how many documents each stage admitted. Rows
    * are (stage, docs-remaining-after-stage), stage-prefixed so they sort
    * in pipeline order. Counts are exact and deterministic (every stage
    * is), so the report is oracle-checkable like any other query; the
    * split stage is a pure projection and cannot change the count, which
    * the report makes visible rather than assuming. */
  def curationReport(docs: DataFrame, textCol: String, idCol: String,
      minTokens: Long = 5L,
      minUniqRatio: Double = 0.3, maxTopShare: Double = 0.2,
      jaccardN: Int = 3, jaccardThreshold: Double = 0.5,
      staging: graft.util.Staging = graft.util.Staging.LocalCheckpoint): DataFrame = {
    val (gated, survivors, nearKept) = stages(docs, textCol, idCol, minTokens,
      minUniqRatio, maxTopShare, jaccardN, jaccardThreshold, staging)
    val spark = docs.sparkSession
    import spark.implicits._
    // survivors is the STAGED exact-dedup output: counting it reads the
    // materialization instead of re-deriving gate + dedup a second time
    Seq(
      ("0_input", docs.count()),
      ("1_quality_gate", gated.count()),
      ("2_exact_dedup", survivors.count()),
      ("3_near_dup", nearKept.count())
    ).toDF("stage", "docs")
  }

  private def stages(docs: DataFrame, textCol: String, idCol: String,
      minTokens: Long, minUniqRatio: Double, maxTopShare: Double,
      jaccardN: Int, jaccardThreshold: Double,
      staging: graft.util.Staging): (DataFrame, DataFrame, DataFrame) = {
    // 1. quality gate (semi-join keeps the caller's full row set intact)
    val stats = TextAnalysis.repetitionStats(docs, textCol, idCol,
      minUniqRatio, maxTopShare)
    val gated = docs.join(
      stats.filter(col("keep") && col("n_tokens") >= minTokens).select(col(idCol)),
      Seq(idCol), "left_semi")
    // 2. exact dedup: smallest id per normalized-content class
    val exactKept = Dedup.exact(
      gated.withColumn("__fp",
        TextAnalysis.fingerprint(coalesce(col(textCol), lit("")))),
      Seq("__fp"), idCol).drop("__fp")
    // 3. near-dup collapse: drop every non-representative cluster member.
    // connectedComponents labels each member with the component's minimum
    // id, so "representative" and "kept exact-dup" agree on the tiebreak.
    val survivors = staging.stage(exactKept, "curate-exact-kept")
    val pairs = Dedup.ngramJaccardPairs(survivors, textCol, idCol,
      jaccardN, jaccardThreshold, staging = staging)
    val dropIds = Dedup.connectedComponents(pairs)
      .filter(col("id") =!= col("comp"))
      .select(col("id").as(idCol))
    val nearKept = survivors.join(dropIds, Seq(idCol), "left_anti")
    (gated, survivors, nearKept)
  }
}
