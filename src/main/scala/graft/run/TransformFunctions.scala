package graft.run

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.config.TransformStep
import graft.operators.Validations
import graft.x.{Curation, Dedup, Profiler, Sampling, Similarity, TextAnalysis}

/** Config-surface dispatch for the engine's NAMED operators — closing the
  * `functionName` half of the reference's transformation step
  * (/root/reference/spark.json:54-65 declares each step as
  * `functionName` + `sqlQuery`; the reference's closed jar treats the
  * name as the unit of dispatch, our open engine treated it as a label
  * and ran only the SQL). With this registry, one JSON config can run a
  * curation pipeline end to end with zero Scala:
  *
  * {{{
  *   {"transformations": [
  *     {"functionName": "curate", "outputDFName": "curated",
  *      "options": {"input": "docs", "textCol": "text", "idCol": "doc_id"}}
  *   ]}
  * }}}
  *
  * Dispatch rule (the orchestrator's): a step WITH `sqlQuery` runs the
  * SQL (reference behavior — the name stays a label); a step WITHOUT
  * `sqlQuery` dispatches its `functionName` here. Every function reads
  * its input frame from `options.input` (a bound view name — the same
  * namespace SQL steps join against) and its parameters from `options`
  * with the library defaults, so the JSON surface mirrors the Scala one
  * parameter-for-parameter. Output registration, count validation, and
  * the pre-flight plan lint are shared with SQL steps in
  * [[Orchestrator]] — a dispatched frame is audited exactly like a SQL
  * frame before anything executes.
  *
  * The registry deliberately exposes the COMPOSED operators (curate,
  * lineage, report) plus the individual curation stages, so a config can
  * either run the one-shot pipeline or rebuild it stage by stage with
  * different thresholds per step. Since r13 it also covers the
  * maintenance families a production deployment schedules on a cadence:
  * the IVF embedding-store lifecycle (assign/build/append/probe/rebuild),
  * validation maintenance (Merkle anti-entropy diff/drill, PSI drift),
  * and — r14 — versioned-table maintenance (vacuumVersions /
  * compactVersioned, the history-reclamation and small-file ops an
  * SCD2-on-VersionedParquet dimension needs forever) — so every
  * recurring operator of a large-scale pipeline is config-drivable, not
  * just the transformations.
  */
object TransformFunctions {

  /** Registered functionName → implementation. */
  val registry: Map[String, (SparkSession, TransformStep) => DataFrame] = Map(
    // the composed curation pipeline and its two lineage surfaces
    // (x60/x62/x73's operators on the config surface)
    "curate" -> ((sp, t) => Curation.curate(in(sp, t), textCol(t), idCol(t),
      lng(t, "minTokens", 5L), dbl(t, "minUniqRatio", 0.3),
      dbl(t, "maxTopShare", 0.2), int(t, "jaccardN", 3),
      dbl(t, "jaccardThreshold", 0.5), dbl(t, "testFraction", 0.1),
      dbl(t, "validationFraction", 0.1))),
    "curationReport" -> ((sp, t) => Curation.curationReport(in(sp, t),
      textCol(t), idCol(t), lng(t, "minTokens", 5L),
      dbl(t, "minUniqRatio", 0.3), dbl(t, "maxTopShare", 0.2),
      int(t, "jaccardN", 3), dbl(t, "jaccardThreshold", 0.5))),
    "curationLineage" -> ((sp, t) => Curation.curationLineage(in(sp, t),
      textCol(t), idCol(t), lng(t, "minTokens", 5L),
      dbl(t, "minUniqRatio", 0.3), dbl(t, "maxTopShare", 0.2),
      int(t, "jaccardN", 3), dbl(t, "jaccardThreshold", 0.5),
      dbl(t, "testFraction", 0.1), dbl(t, "validationFraction", 0.1))),
    // the individual stages, for configs that re-compose the pipeline
    "exactDedup" -> ((sp, t) =>
      Dedup.exactByContent(in(sp, t), textCol(t), idCol(t))),
    "repetitionStats" -> ((sp, t) =>
      TextAnalysis.repetitionStats(in(sp, t), textCol(t), idCol(t))),
    "trainTestSplit" -> ((sp, t) => Sampling.trainTestSplit(in(sp, t),
      idCol(t), dbl(t, "testFraction", 0.1),
      dbl(t, "validationFraction", 0.1))),
    "stratifiedSample" -> ((sp, t) => Sampling.stratifiedSample(in(sp, t),
      idCol(t), str(t, "strataCol", "lang"), fractions(t))),
    // multi-input steps: the second frame is ANOTHER bound view, read by
    // name from options — the same namespace SQL joins use, so a config
    // can decontaminate its corpus against a benchmark it bound in
    // phase_1 (or produced with an earlier step)
    "decontaminate" -> ((sp, t) => TextAnalysis.decontaminate(in(sp, t),
      view(sp, t, "benchmark"), textCol(t), idCol(t))),
    "bloomDecontaminate" -> ((sp, t) => TextAnalysis.bloomDecontaminate(
      in(sp, t), view(sp, t, "benchmark"), textCol(t), idCol(t),
      lng(t, "expectedItems", 1000000L), dbl(t, "fpp", 0.01))),
    // per-row text hygiene/analysis columns appended to the input
    "languageId" -> ((sp, t) => in(sp, t).withColumn(
      str(t, "outputCol", "lang_pred"),
      TextAnalysis.languageIdHeuristic(col(textCol(t))))),
    "redactPii" -> ((sp, t) => in(sp, t).withColumn(
      str(t, "outputCol", "text_redacted"),
      TextAnalysis.redactPii(col(textCol(t))))),
    "textStats" -> ((sp, t) => {
      val d = in(sp, t); val tc = col(textCol(t))
      d.select(col(idCol(t)),
        TextAnalysis.tokenCount(tc).cast("long").as("n_tokens"),
        TextAnalysis.subwordTokenEstimate(tc).cast("long").as("n_subwords"),
        round(TextAnalysis.avgWordLength(tc), 4).as("avg_word_len"),
        round(TextAnalysis.stopwordRatio(tc), 4).as("stopword_ratio"),
        round(TextAnalysis.punctRatio(tc), 4).as("punct_ratio"),
        TextAnalysis.qualityScore(tc).as("quality"))
    }),
    // similarity-store maintenance: the IVF lifecycle a live embedding
    // store schedules — build the cell-partitioned layout, append a
    // batch, probe it, rebuild under new centroids (x46/x143/x15's
    // operators on the config surface). The store-mutating entries
    // return a 1-row stats frame so `countValidation: 1` doubles as a
    // did-it-run gate.
    "ivfAssign" -> ((sp, t) => Similarity.assignToCentroids(in(sp, t),
      view(sp, t, "centroids"), vecIdCol(t), centroidIdCol(t), vecCol(t))),
    "ivfBuildLayout" -> ((sp, t) => {
      Similarity.writeIvfLayout(in(sp, t), view(sp, t, "centroids"),
        vecIdCol(t), centroidIdCol(t), vecCol(t), path(t))
      layoutStats(sp, path(t))
    }),
    "ivfAppend" -> ((sp, t) => {
      Similarity.appendToIvfLayout(in(sp, t), view(sp, t, "centroids"),
        vecIdCol(t), centroidIdCol(t), vecCol(t), path(t))
      layoutStats(sp, path(t))
    }),
    // `input` = the QUERY frame (the layout is addressed by path)
    "ivfProbe" -> ((sp, t) => Similarity.ivfTopKFromLayout(sp, path(t),
      in(sp, t), view(sp, t, "centroids"),
      vecIdCol(t), str(t, "qIdCol", "q_id"), centroidIdCol(t), vecCol(t),
      int(t, "k", 10), int(t, "nprobe", 3))),
    "ivfRebuild" -> ((sp, t) => {
      val (rows, cells) = Similarity.rebuildIvfLayout(sp, path(t),
        view(sp, t, "centroids"), vecIdCol(t), centroidIdCol(t), vecCol(t))
      sp.range(1).select(lit(rows).as("rows_rewritten"), lit(cells).as("cells"))
    }),
    // validation maintenance: Merkle anti-entropy and PSI drift between
    // two bound frames (x137/x140/x90's operators on the config surface).
    // keyExpr/rowExpr are SQL expressions evaluated against BOTH frames —
    // the same caller contract as the Scala API (render doubles through
    // DECIMAL; see Validations.merkleLeaves).
    "merkleDiff" -> ((sp, t) => Validations.merkleDiff(
      Validations.merkleLeaves(in(sp, t),
        expr(req(t, "keyExpr")), expr(req(t, "rowExpr")), int(t, "fanout", 256)),
      Validations.merkleLeaves(view(sp, t, "against"),
        expr(req(t, "keyExpr")), expr(req(t, "rowExpr")), int(t, "fanout", 256)))),
    "merkleDrill" -> ((sp, t) => Validations.merkleDrill(
      in(sp, t), view(sp, t, "against"),
      expr(req(t, "keyExpr")), expr(req(t, "rowExpr")),
      int(t, "levels", 2), int(t, "fanout", 256),
      int(t, "maxDrillPaths", 4096))),
    "psiDrift" -> ((sp, t) => Profiler.psiDrift(in(sp, t),
      view(sp, t, "against"), req(t, "valueCol"), int(t, "nBuckets", 20),
      reqDbl(t, "lo"), reqDbl(t, "hi"))),
    // versioned-table maintenance (r14): SCD2-on-VersionedParquet creates
    // one version per merge forever; 100 TB churn schedules history
    // reclamation and small-file compaction as config steps on a cadence,
    // exactly like the ivf family. Both return 1-row stats frames so
    // `countValidation: 1` doubles as a did-it-run gate. `compactVersioned`
    // inherits the store's own refusal of partition-scoped tables (a
    // whole-snapshot rewrite would break bucket attribution — vacuum is
    // the right maintenance there, per-bucket file counts are already
    // bounded by each merge's rewrite).
    "vacuumVersions" -> ((sp, t) => {
      val removed = graft.sources.VersionedParquet.vacuum(
        path(t), int(t, "keepVersions", 1),
        lng(t, "orphanGraceMs", 24L * 3600 * 1000))
      val kept = graft.sources.VersionedParquet.versions(path(t)).size
      sp.range(1).select(lit(removed).as("files_removed"),
        lit(kept).as("versions_kept"))
    }),
    "compactVersioned" -> ((sp, t) => {
      graft.sources.VersionedParquet.compact(sp, path(t),
        int(t, "targetFiles", 1))
      val files = graft.sources.VersionedParquet.snapshotFileCount(path(t))
      val vers = graft.sources.VersionedParquet.versions(path(t)).size
      sp.range(1).select(lit(files).as("snapshot_files"),
        lit(vers).as("versions"))
    })
  )

  def isRegistered(name: String): Boolean = registry.contains(name)

  /** Per-function accepted option keys — a typo'd key must fail the job,
    * not silently run the default (same rule as a typo'd functionName). */
  private val common = Set("input", "textCol", "idCol")
  private val curationKnobs = Set("minTokens", "minUniqRatio",
    "maxTopShare", "jaccardN", "jaccardThreshold")
  private val splitKnobs = Set("testFraction", "validationFraction")
  private val ivfCommon = Set("centroids", "idCol", "centroidIdCol", "vecCol")
  val allowedOptions: Map[String, Set[String]] = Map(
    "curate" -> (common ++ curationKnobs ++ splitKnobs),
    "curationReport" -> (common ++ curationKnobs),
    "curationLineage" -> (common ++ curationKnobs ++ splitKnobs),
    "exactDedup" -> common,
    "repetitionStats" -> common,
    "trainTestSplit" -> (Set("input", "idCol") ++ splitKnobs),
    "stratifiedSample" -> Set("input", "idCol", "strataCol", "fractions"),
    "languageId" -> Set("input", "textCol", "outputCol"),
    "redactPii" -> Set("input", "textCol", "outputCol"),
    "textStats" -> common,
    "decontaminate" -> (common + "benchmark"),
    "bloomDecontaminate" -> (common ++ Set("benchmark", "expectedItems", "fpp")),
    "ivfAssign" -> (ivfCommon + "input"),
    "ivfBuildLayout" -> (ivfCommon ++ Set("input", "path")),
    "ivfAppend" -> (ivfCommon ++ Set("input", "path")),
    "ivfProbe" -> (ivfCommon ++ Set("input", "path", "qIdCol", "k", "nprobe")),
    "ivfRebuild" -> (ivfCommon + "path"), // no `input`: the store IS the input
    "merkleDiff" -> Set("input", "against", "keyExpr", "rowExpr", "fanout"),
    "merkleDrill" -> Set("input", "against", "keyExpr", "rowExpr",
      "fanout", "levels", "maxDrillPaths"),
    "psiDrift" -> Set("input", "against", "valueCol", "nBuckets", "lo", "hi"),
    // no `input`: the versioned store at `path` IS the input (ivfRebuild rule)
    "vacuumVersions" -> Set("path", "keepVersions", "orphanGraceMs"),
    "compactVersioned" -> Set("path", "targetFiles")
  )

  /** Run a registered function for a transformation step; loud error
    * naming the registered set on a miss (a typo'd functionName must
    * fail the job, not silently no-op) and the accepted keys on an
    * unknown option (a typo'd knob must not silently run the default). */
  def dispatch(spark: SparkSession, step: TransformStep): DataFrame = {
    val fn = registry.getOrElse(step.functionName, sys.error(
      s"transformation '${step.outputDFName}': functionName " +
        s"'${step.functionName}' is not registered and the step has no " +
        s"sqlQuery — registered functions: " +
        registry.keys.toSeq.sorted.mkString(", ")))
    val allowed = allowedOptions(step.functionName)
    val unknown = step.options.keySet -- allowed
    if (unknown.nonEmpty) sys.error(
      s"transformation '${step.outputDFName}' (${step.functionName}): " +
        s"unknown options ${unknown.toSeq.sorted.mkString(", ")} — " +
        s"accepted: ${allowed.toSeq.sorted.mkString(", ")}")
    fn(spark, step)
  }

  // ---- option parsing: every parameter mirrors the Scala default ----
  private def view(spark: SparkSession, t: TransformStep, key: String): DataFrame =
    spark.table(t.options.getOrElse(key, sys.error(
      s"functionName step '${t.functionName}' needs options.$key " +
        "(a bound dataFrameName / outputDFName to read)")))
  private def in(spark: SparkSession, t: TransformStep): DataFrame =
    view(spark, t, "input")
  private def str(t: TransformStep, k: String, d: String): String =
    t.options.getOrElse(k, d)
  private def req(t: TransformStep, k: String): String =
    t.options.getOrElse(k, sys.error(
      s"functionName step '${t.functionName}' needs options.$k"))
  private def textCol(t: TransformStep): String = str(t, "textCol", "text")
  private def idCol(t: TransformStep): String = str(t, "idCol", "doc_id")
  private def vecIdCol(t: TransformStep): String = str(t, "idCol", "vec_id")
  private def centroidIdCol(t: TransformStep): String =
    str(t, "centroidIdCol", "centroid_id")
  private def vecCol(t: TransformStep): String = str(t, "vecCol", "embedding")
  private def path(t: TransformStep): String = req(t, "path")
  private def reqDbl(t: TransformStep, k: String): Double =
    try req(t, k).trim.toDouble catch {
      case _: NumberFormatException => sys.error(
        s"functionName step '${t.functionName}': options.$k is not a number")
    }
  /** 1-row (rows, cells) census of a cell-partitioned layout — the
    * store-mutating IVF steps' output frame (scans footers only at the
    * count level; cheap relative to the write it audits). */
  private def layoutStats(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .agg(count(lit(1)).as("rows"), countDistinct(col("cell")).as("cells"))
  private def num[A](t: TransformStep, k: String, d: A, parse: String => A): A =
    t.options.get(k).map(v => try parse(v.trim) catch {
      case _: NumberFormatException => sys.error(
        s"functionName step '${t.functionName}': options.$k = '$v' is not a number")
    }).getOrElse(d)
  private def int(t: TransformStep, k: String, d: Int): Int = num(t, k, d, _.toInt)
  private def lng(t: TransformStep, k: String, d: Long): Long = num(t, k, d, _.toLong)
  private def dbl(t: TransformStep, k: String, d: Double): Double = num(t, k, d, _.toDouble)
  /** `"en:0.5,zh:0.25"` → Map(en → 0.5, zh → 0.25) (strata fractions).
    * Absent/empty/malformed is a LOUD config error — an empty map would
    * make stratifiedSample keep every row, a silent no-op "sample" (the
    * exact failure mode the registry's typo rule exists to prevent). */
  private def fractions(t: TransformStep): Map[String, Double] = {
    val raw = t.options.getOrElse("fractions", sys.error(
      s"functionName step '${t.functionName}' needs options.fractions " +
        """(e.g. "en:0.5,zh:0.25") — without it the sample keeps every row"""))
    val pairs = raw.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { kv =>
      kv.split(":").map(_.trim) match {
        case Array(k, v) if k.nonEmpty =>
          k -> (try v.toDouble catch { case _: NumberFormatException =>
            sys.error(s"options.fractions: '$kv' has a non-numeric fraction") })
        case _ => sys.error(
          s"options.fractions: '$kv' is not <stratum>:<fraction>")
      }
    }
    if (pairs.isEmpty) sys.error("options.fractions parsed to no strata")
    pairs.toMap
  }
}
