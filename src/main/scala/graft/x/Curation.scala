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
    val sf = stages(docs, textCol, idCol, minTokens,
      minUniqRatio, maxTopShare, jaccardN, jaccardThreshold, staging)
    // 4. deterministic split over the retained corpus
    Sampling.trainTestSplit(sf.nearKept, idCol, testFraction, validationFraction)
  }

  /** Per-DOCUMENT curation lineage — the row-level companion to
    * [[curationReport]]'s counts, and the answer to the question every
    * pipeline owner eventually debugs: "why is my document not in the
    * training set?" One row per input document:
    *
    *   - `outcome` ∈ `dropped_quality` | `dropped_exact_dup` |
    *     `dropped_near_dup` | `kept_train` | `kept_validation` |
    *     `kept_test` (the same stage chain, split labels included so the
    *     lineage row IS the final disposition);
    *   - `kept_by` — for the two duplicate classes, the id of the
    *     representative that survived in this document's place (the
    *     exact-dup keeper / the near-dup component representative);
    *     NULL otherwise.
    *
    * Derived off the SAME lazy stage chain as [[curate]] (one
    * implementation of the stages, three surfaces), stitched with
    * id-keyed left joins — everything is keyed by document id, so the
    * joins co-partition with the stages that produced them. */
  def curationLineage(docs: DataFrame, textCol: String, idCol: String,
      minTokens: Long = 5L,
      minUniqRatio: Double = 0.3, maxTopShare: Double = 0.2,
      jaccardN: Int = 3, jaccardThreshold: Double = 0.5,
      testFraction: Double = 0.1, validationFraction: Double = 0.1,
      staging: graft.util.Staging = graft.util.Staging.LocalCheckpoint): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sf = stages(docs, textCol, idCol, minTokens,
      minUniqRatio, maxTopShare, jaccardN, jaccardThreshold, staging)
    val keeper = sf.fpTagged
      .withColumn("__keep", min(col(idCol)).over(Window.partitionBy("__fp")))
      .select(col(idCol), col("__keep"))
    val compMap = sf.comps.select(col("id").as(idCol), col("comp"))
    val split = Sampling.trainTestSplit(sf.nearKept, idCol,
        testFraction, validationFraction)
      .select(col(idCol), col("split"))
    val isExactDrop = col("__keep").isNotNull && col("__keep") =!= col(idCol)
    val isNearDrop = col("comp").isNotNull && col("comp") =!= col(idCol)
    docs.select(col(idCol))
      .join(keeper, Seq(idCol), "left")
      .join(compMap, Seq(idCol), "left")
      .join(split, Seq(idCol), "left")
      .select(col(idCol),
        when(col("__keep").isNull, lit("dropped_quality"))
          .when(isExactDrop, lit("dropped_exact_dup"))
          .when(isNearDrop, lit("dropped_near_dup"))
          .otherwise(concat(lit("kept_"), col("split"))).as("outcome"),
        when(isExactDrop, col("__keep"))
          .when(isNearDrop, col("comp")).as("kept_by"))
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
    val sf = stages(docs, textCol, idCol, minTokens,
      minUniqRatio, maxTopShare, jaccardN, jaccardThreshold, staging)
    val spark = docs.sparkSession
    import spark.implicits._
    // survivors is the STAGED exact-dedup output: counting it reads the
    // materialization instead of re-deriving gate + dedup a second time
    Seq(
      ("0_input", docs.count()),
      ("1_quality_gate", sf.gated.count()),
      ("2_exact_dedup", sf.survivors.count()),
      ("3_near_dup", sf.nearKept.count())
    ).toDF("stage", "docs")
  }

  /** The stage chain every surface reads. `gated`, `survivors`, and
    * `comps` are STAGED (eager, lineage-truncated) because two or more
    * surfaces consume each — the gate's tokenize pass and the co-shingle
    * join must run exactly once per pipeline, not once per consumer.
    * They all sit on [[curate]]'s own critical path, so curate pays no
    * extra pass; the one lineage-only frame (`fpTagged`) stays lazy. */
  private final case class StageFrames(gated: DataFrame, fpTagged: DataFrame,
      survivors: DataFrame, comps: DataFrame, nearKept: DataFrame)

  /** Dataset card: the per-(group) summary table a corpus release ships —
    * docs, exact token totals, corpus token share, mean document length,
    * and the WITHIN-group exact-duplicate rate (1 − distinct normalized
    * fingerprints / docs — the "how much of this source is re-crawls of
    * itself" number). Composes the library's own primitives
    * ([[TextAnalysis.tokenCount]], [[TextAnalysis.fingerprint]]) so the
    * card's numbers are definitionally consistent with what the curation
    * operators act on.
    *
    * Shape at 100 TB: ONE grouped aggregation over the corpus (count,
    * exact BIGINT token sum, one distinct-fingerprint sub-aggregation —
    * 8-byte hashes shuffle, never text); the share denominators ride an
    * unpartitioned window over the group-count-sized frame. Doubles are
    * single divisions of exact BIGINTs in fixed form — engine-replayable. */
  def datasetCard(df: DataFrame, textCol: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "dataset card needs at least one group column")
    import org.apache.spark.sql.expressions.Window
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("docs"),
        sum(TextAnalysis.tokenCount(col(textCol)).cast("long")).as("tokens"),
        countDistinct(TextAnalysis.fingerprint(col(textCol))).as("__uniq"))
      .withColumn("__total", sum("tokens").over(Window.partitionBy()))
      .withColumn("token_share",
        col("tokens").cast("double") / col("__total").cast("double"))
      .withColumn("mean_tokens",
        col("tokens").cast("double") / col("docs").cast("double"))
      .withColumn("dup_rate",
        (col("docs") - col("__uniq")).cast("double") / col("docs").cast("double"))
      .select(groupCols.map(col) ++ Seq(col("docs"), col("tokens"),
        col("token_share"), col("mean_tokens"), col("dup_rate")): _*)
  }

  private def stages(docs: DataFrame, textCol: String, idCol: String,
      minTokens: Long, minUniqRatio: Double, maxTopShare: Double,
      jaccardN: Int, jaccardThreshold: Double,
      staging: graft.util.Staging): StageFrames = {
    // 1. quality gate (semi-join keeps the caller's full row set intact).
    // Staged: the gate's tokenize pass feeds the dedup chain AND the
    // report/lineage surfaces — without truncation each consumer (and any
    // memory-pressure lineage replay) re-runs repetitionStats.
    val gated = staging.stage(docs.join(
      TextAnalysis.repetitionStats(docs, textCol, idCol,
          minUniqRatio, maxTopShare)
        .filter(col("keep") && col("n_tokens") >= minTokens).select(col(idCol)),
      Seq(idCol), "left_semi"), "curate-gated")
    // 2. exact dedup: smallest id per normalized-content class
    val fpTagged = gated.withColumn("__fp",
      TextAnalysis.fingerprint(coalesce(col(textCol), lit(""))))
    val exactKept = Dedup.exact(fpTagged, Seq("__fp"), idCol).drop("__fp")
    // 3. near-dup collapse: drop every non-representative cluster member.
    // connectedComponents labels each member with the component's minimum
    // id, so "representative" and "kept exact-dup" agree on the tiebreak.
    val survivors = staging.stage(exactKept, "curate-exact-kept")
    val pairs = Dedup.ngramJaccardPairs(survivors, textCol, idCol,
      jaccardN, jaccardThreshold, staging = staging)
    // comps feeds nearKept here AND lineage's compMap + split (which
    // reads nearKept again) — staged so the co-shingle join runs once.
    val comps = staging.stage(Dedup.connectedComponents(pairs), "curate-comps")
    val dropIds = comps
      .filter(col("id") =!= col("comp"))
      .select(col("id").as(idCol))
    val nearKept = survivors.join(dropIds, Seq(idCol), "left_anti")
    StageFrames(gated, fpTagged, survivors, comps, nearKept)
  }

  /** Survivorship / golden-record construction — the step after entity
    * resolution ([[Dedup.resolveEntities]]) in every MDM pipeline: one
    * output row per cluster, where each field independently takes its
    * value from the highest-priority record that HAS one (nulls never
    * win), ties broken by highest `idCol` so the choice is total and
    * deterministic.
    *
    * Implementation is one hash aggregation: per field,
    * `max(struct(priority, id, field))` over non-null-field rows — the
    * lexicographic struct max IS the survivorship rule, computed with
    * map-side partials on the cluster key. No per-field window passes
    * (`fields.length` sorted shuffles), no self-joins; 100 TB of member
    * rows shuffle once. */
  /** Cross-source exact-duplicate overlap matrix: for every ordered
    * source pair, how many of A's DISTINCT content fingerprints also
    * appear in B, as count and share — the corpus-card heatmap that
    * answers "is this new crawl actually new" before any pairwise dedup
    * runs. Diagonal rows report each source's distinct count against
    * itself (share 1.0), so the output is self-describing.
    *
    * One fingerprint-distinct aggregation, then a fingerprint-keyed
    * self-join restricted to distinct (fp, source) rows — cardinality
    * sources × fingerprints, NOT documents² (a fingerprint present in s
    * sources contributes s² matrix cells, bounded by the source count).
    * Counts are BIGINT; the share is one division per cell. */
  def sourceOverlapMatrix(df: DataFrame, textCol: String,
      sourceCol: String): DataFrame = {
    val fps = df.select(col(sourceCol).as("src_a"),
        xxhash64(col(textCol)).as("__fp")).distinct()
    val sizes = fps.groupBy("src_a").agg(count(lit(1)).as("__na"))
    fps.join(fps.select(col("src_a").as("src_b"), col("__fp")), "__fp")
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("overlap"))
      .join(sizes, "src_a")
      .select(col("src_a"), col("src_b"), col("overlap").cast("long").as("overlap"),
        col("__na").cast("long").as("distinct_a"),
        (col("overlap").cast("double") / col("__na").cast("double")).as("share_of_a"))
  }

  def goldenRecord(df: DataFrame, clusterCol: String, priorityCol: String,
      idCol: String, fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty, "goldenRecord needs at least one field")
    val aggs = fields.map { f =>
      max(when(col(f).isNotNull,
        struct(col(priorityCol), col(idCol), col(f)))).getField(f).as(f)
    }
    df.groupBy(col(clusterCol)).agg(aggs.head, aggs.tail: _*)
  }
}
