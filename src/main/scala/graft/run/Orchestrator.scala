package graft.run

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.config._
import graft.operators.Validations
import graft.sinks.SinkWriter
import graft.sources.SourceReader
import java.nio.file.{Files, Paths}

/** The engine's job runner — the open re-implementation of the reference's
  * closed `com.xyz.spark.etl.main.Orchestrator` jar entry point
  * (/root/reference/example-shareprice.py:81,148), whose behavior is fully
  * declared by the config template (/root/reference/spark.json). Lifecycle
  * follows SURVEY.md §3.2 verbatim:
  *
  *   parse config → spark-conf passthrough → duplicate-run guard →
  *   pre-exec scripts → phase_1 bind inputs (+ junk-char cleanup,
  *   metadata mapping, projection) → phase_2 validations (null-key, keyed
  *   dedup; bad rows → error sink; threshold gate) → phase_2 SQL transform
  *   chain (each step registers outputDFName) → phase_3 sinks (load
  *   strategies, fan-out, reconciliation) → archive inputs → post-exec.
  *
  * All query processing is delegated to Spark SQL (spark.json:57 is the
  * reference's only query interface) — the orchestrator's job is correct
  * view registration, routing, and conf; Catalyst does the optimizing.
  */
class Orchestrator(spark: SparkSession) {

  /** Run one job end-to-end. Returns the last transformation's frame (for
    * tests / chaining); all declared sinks have been written on return.
    * `"mode": "streaming"` dispatches to [[StreamingOrchestrator]] and runs
    * the currently-available data to exhaustion (AvailableNow). */
  def run(cfg: JobConfig): DataFrame = run(cfg, None)

  /** `commitToken`: stable identity of one logical pipeline-step execution
    * across its retry attempts (O2). When set (and `tempPath` exists), each
    * sink that commits drops a marker file; a retry of the same token skips
    * already-committed sinks, so a job that fails AFTER an append-mode sink
    * committed doesn't re-append (duplicate) its rows on the next attempt
    * (ADVICE r1 — SCD2 is merge-idempotent, simpleInsert append is not).
    * Markers are cleared when the run succeeds. */
  def run(cfg: JobConfig, commitToken: Option[String]): DataFrame = {
    if (cfg.mode == "streaming") {
      new StreamingOrchestrator(spark).runOnce(cfg)
      return null
    }
    cfg.sparkConfig.foreach { case (k, v) => spark.conf.set(k, v) }
    // graft's custom expressions are part of the SQL surface a config-driven
    // job can use (the reference's only query interface is sqlQuery text)
    graft.functions.GraftFunctions.register(spark)

    // P3: the _RUNNING marker guards against CONCURRENT duplicate runs, so
    // it must be released when this run ends (success OR failure) — holding
    // it until JVM exit would turn every transient failure into a permanent
    // one under the pipeline retry loop (O2)
    val marker = if (cfg.duplicateRunCheck) Some(acquireRunMarker(cfg)) else None
    try {
      val out = runPhases(cfg, commitToken)
      marker.foreach { m =>
        Files.writeString(m.resolveSibling(s"${cfg.jobName}_SUCCESS"),
          java.time.Instant.now().toString)
      }
      clearSinkMarkers(cfg, commitToken)
      out
    } finally marker.foreach { m =>
      Files.deleteIfExists(m)
      Orchestrator.untrackMarker(m)
    }
  }

  private def runPhases(cfg: JobConfig, commitToken: Option[String]): DataFrame = {
    cfg.preExecution.scripts.foreach(runScript)

    // phase_1 — bind inputs as named temp views
    val inputFrames = cfg.inputs.map { in =>
      val raw = SourceReader.read(spark, in)
      val cleaned =
        if (cfg.preExecution.junkCharacterRemoval) SourceReader.stripJunkCharacters(raw) else raw
      cleaned.createOrReplaceTempView(in.dataFrameName)
      in.dataFrameName -> cleaned
    }.toMap

    // phase_2 — validations route bad rows out and re-register the good set
    var badTotal = 0L
    cfg.validations.foreach { v =>
      val df = spark.table(v.dataFrameName)
      val routed = v match {
        case NullValueCheck(_, pks)          => Validations.nullKeyCheck(df, pks)
        case DuplicateRecordCheck(_, pks, o) => Validations.dedup(df, pks, o)
      }
      val bad = routed.bad.persist()
      val nBad = bad.count()
      badTotal += nBad
      if (nBad > 0) cfg.errorSink.foreach(es => SinkWriter.writeErrors(spark, bad, cfg.jobName, es))
      bad.unpersist()
      routed.good.createOrReplaceTempView(v.dataFrameName)
    }
    // threshold denominator: SURVIVING rows counted once per validated
    // frame (summing per-validation good counts would double-count rows
    // that pass several validations and dilute the gate)
    if (cfg.thresholdLimit.isDefined && cfg.validations.nonEmpty) {
      val goodTotal = cfg.validations.map(_.dataFrameName).distinct
        .map(n => spark.table(n).count()).sum
      Validations.thresholdGate(goodTotal, badTotal, cfg.thresholdLimit.get)
    }

    // phase_2 — transformation chain (spark.json:54-65); sqlQuery may be
    // inline SQL or a .sql file path (spark.json:57); a step without SQL
    // dispatches its functionName to the named-operator registry
    var last: DataFrame = inputFrames.values.lastOption.orNull
    cfg.transformations.foreach { t =>
      val out =
        if (t.sqlQuery.nonEmpty) spark.sql(resolveSql(t.sqlQuery))
        else TransformFunctions.dispatch(spark, t)
      // pre-flight plan lint: a typo'd join predicate is invisible at dev
      // scale and a cluster-week at 100 TB — catch it before execution.
      // warn: surface findings, never block (a cross join CAN be a tiny
      // intentional dim×dim); strict: fail the step on error/warn findings
      if (cfg.planAudit != "off") {
        val findings =
          (if (cfg.planAudit == "strict")
            graft.util.PlanAudit.assertSafe(out, allowWarnings = false)
          else graft.util.PlanAudit.audit(out)) ++
          // staging lint: a SQL step whose subquery/CTE re-evaluates a
          // shuffle pipeline per consumer multiplies the dominant pass at
          // scale (warn-only even in strict mode — identical copies are
          // exchange-reused; the finding prices the divergent risk)
          graft.util.PlanAudit.repeatedSubtrees(out)
        findings.filter(_.severity != "info")
          .foreach(f => System.err.println(
            s"[plan-audit] ${t.outputDFName}: ${f.severity} ${f.node} — ${f.detail}"))
      }
      out.createOrReplaceTempView(t.outputDFName)
      t.countValidation.foreach(Validations.countValidation(out, _))
      last = out
    }

    // phase_3 — sinks (fan-out persists once when several sinks share a
    // frame; per-sink commit markers make the retry loop idempotent)
    cfg.sinks.zipWithIndex.groupBy(_._1.dataFrameName).foreach { case (name, sinksIdx) =>
      val df = spark.table(name)
      val (done, pending) = sinksIdx.partition { case (_, i) =>
        sinkMarker(cfg, commitToken, i).exists(Files.exists(_))
      }
      done.foreach { case (s, i) =>
        System.err.println(s"[orchestrator] sink $name[$i] already committed in a prior attempt; skipping")
      }
      val cached = if (pending.sizeIs > 1) df.persist() else df
      // pre-write snapshot for append-sink reconciliation (V5): an append
      // target accumulates prior batches, so "target == batch" can never
      // hold — the checkable contract is the DELTA this write added, which
      // needs the target's state captured before the write
      val preStates: Map[Int, Long] = pending.collect {
        case (s, i) if s.reconciliation && isAppendSink(s) && s.path.isDefined =>
          i -> appendPreState(s, s.path.get)
      }.toMap
      try pending.foreach { case (s, i) =>
        SinkWriter.write(spark, cached, s)
        sinkMarker(cfg, commitToken, i).foreach { m =>
          Files.createDirectories(m.getParent)
          Files.writeString(m, java.time.Instant.now().toString)
        }
      } finally if (pending.sizeIs > 1) { cached.unpersist(); () }
      sinksIdx.filter(_._1.reconciliation).foreach { case (s, i) =>
        s.path.foreach { p =>
          reconcileSink(name, df, s, p, preStates.get(i))
        }
      }
    }

    cfg.archiveInput.foreach { a =>
      cfg.inputs.flatMap(_.path).foreach(p =>
        SinkWriter.archiveInput(p, a.archivePath, a.deleteSourceAfterArchival))
    }
    cfg.postExecutionScripts.foreach(runScript)
    last
  }

  private def resolveSql(sql: String): String = Orchestrator.resolveSql(sql)

  private def isDeltaFormat(s: SinkSpec): Boolean =
    s.format == "delta" || s.format == "deltalake"

  private def isAppendSink(s: SinkSpec): Boolean =
    s.loadType.toLowerCase == "simpleinsert" && s.savemode.equalsIgnoreCase("append")

  /** The append target's pre-write state: for delta sinks the latest
    * committed VERSION (so the post-write check reads exactly this batch
    * back through the change feed); for plain file sinks the current row
    * count (0 for a first write). */
  private def appendPreState(s: SinkSpec, p: String): Long =
    if (isDeltaFormat(s)) graft.sources.VersionedParquet.versions(p).lastOption.getOrElse(-1L)
    else
      try spark.read.format(s.format).options(s.options).load(p).count()
      catch { case _: org.apache.spark.sql.AnalysisException => 0L }

  /** V5 reconciliation re-read (ADVICE r1): delta sinks go through the
    * manifest reader (not a registered Spark datasource), file sinks are
    * re-read with the sink's own options (csv header would otherwise count
    * as a data row). Append-mode sinks — whose target holds more than this
    * batch by design — reconcile against the DELTA instead of the whole
    * target: delta-format appends read this batch back via the change feed
    * (full count + checksum compare), plain file appends check the target
    * grew by exactly the batch's row count (pre-state captured before the
    * write). SCD2 targets are the merged dimension, not this batch — still
    * skipped. */
  private def reconcileSink(name: String, df: DataFrame, s: SinkSpec, p: String,
      preState: Option[Long]): Unit = {
    val lt = s.loadType.toLowerCase
    if (lt == "scdtype2insert") {
      System.err.println(s"[reconcile] skipped for sink $name → $p: " +
        "scd2 target is the merged dimension, not this batch")
      return
    }
    if (isAppendSink(s)) {
      preState match {
        case None =>
          // committed by a prior attempt — the pre-write state is gone, so
          // the delta is unreconstructable for plain files; don't invent one
          System.err.println(s"[reconcile] skipped for sink $name → $p: " +
            "append sink committed by a prior attempt (no pre-write state)")
        case Some(preVersion) if isDeltaFormat(s) =>
          val appended = graft.sources.VersionedParquet
            .readChanges(spark, p, preVersion)
            .filter(org.apache.spark.sql.functions.col("_change_type") === "insert")
            .drop("_change_type", "_commit_version")
          if (!Validations.reconcile(df, appended))
            throw new IllegalStateException(
              s"append reconciliation failed for sink $name → $p: " +
                "change feed does not match the written batch")
        case Some(preCount) =>
          val after = spark.read.format(s.format).options(s.options).load(p).count()
          val batch = df.count()
          if (after - preCount != batch)
            throw new IllegalStateException(
              s"append reconciliation failed for sink $name → $p: target grew by " +
                s"${after - preCount} rows, batch had $batch")
      }
      return
    }
    val target =
      if (isDeltaFormat(s)) graft.sources.VersionedParquet.read(spark, p)
      else spark.read.format(s.format).options(s.options).load(p)
    if (!Validations.reconcile(df, target))
      throw new IllegalStateException(s"reconciliation failed for sink $name → $p")
  }

  /** Marker path for sink `i` of this (job, pipeline-step-execution): needs
    * both a commit token and a tempPath to be trackable. */
  private def sinkMarker(cfg: JobConfig, token: Option[String], i: Int): Option[java.nio.file.Path] =
    for (t <- token; tmp <- cfg.tempPath)
      yield Paths.get(tmp, "_commits", s"${cfg.jobName}_${t}_sink$i")

  private def clearSinkMarkers(cfg: JobConfig, token: Option[String]): Unit =
    (0 until cfg.sinks.size).foreach(i =>
      sinkMarker(cfg, token, i).foreach(Files.deleteIfExists(_)))

  /** P3 duplicate-run guard (spark.json:8-9): marker-file check-and-create
    * under the temp path; caller releases the marker when the run ends, a
    * shutdown hook covers hard JVM death. ONE static hook over a live set
    * — a hook per acquisition would leak a whole Thread object per run in
    * a long-lived scheduler process (hooks are never deregistered).
    * Single-scheduler assumption documented in SURVEY.md §7.4 (matches
    * the reference's one-Airflow-DAG model). */
  private def acquireRunMarker(cfg: JobConfig): java.nio.file.Path = {
    val tmp = cfg.tempPath.getOrElse(sys.error("duplicateRunCheck needs tempPath"))
    Files.createDirectories(Paths.get(tmp))
    val marker = Paths.get(tmp, s"${cfg.jobName}_RUNNING")
    try Files.createFile(marker) // atomic check-and-create
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new IllegalStateException(
          s"duplicate run detected for job ${cfg.jobName} ($marker exists)")
    }
    Orchestrator.trackMarker(marker)
    marker
  }

  /** P2/W13 pre-/post-exec scripts (spark.json:28-30,102-106). */
  private def runScript(script: String): Unit = {
    import scala.sys.process._
    val code = Seq("bash", "-c", script).!
    if (code != 0) throw new IllegalStateException(s"script failed ($code): $script")
  }
}

object Orchestrator {
  /** Run markers not yet released; the ONE registered shutdown hook
    * sweeps them on hard JVM death (see acquireRunMarker). */
  private val liveMarkers =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()
  private lazy val hookInstalled: Unit = {
    sys.addShutdownHook {
      liveMarkers.forEach(m => Files.deleteIfExists(m))
    }
    ()
  }
  private[run] def trackMarker(m: java.nio.file.Path): Unit = {
    hookInstalled
    liveMarkers.add(m); ()
  }
  private[run] def untrackMarker(m: java.nio.file.Path): Unit = {
    liveMarkers.remove(m); ()
  }

  /** Inline SQL, or the contents of a `.sql` file when the string is a
    * path to one (spark.json:57 "<Spark SQL Query| sql file path>").
    * Shared by the batch and streaming orchestrators so the same config is
    * portable between modes. */
  private[run] def resolveSql(sql: String): String = {
    val t = sql.trim
    if (t.toLowerCase.endsWith(".sql") && !t.contains("\n") &&
        Files.exists(Paths.get(t)))
      new String(Files.readAllBytes(Paths.get(t)), "UTF-8")
    else sql
  }
}

/** O1/O2 — the DAG layer: the reference runs 4 Orchestrator jobs in
  * sequence on an ephemeral cluster, exchanging data only through storage
  * (/root/reference/example-shareprice.py:148-153). Locally that collapses
  * to an in-process sequence of jobs over one SparkSession with a per-step
  * retry loop (retries: 3, example-shareprice.py:64 / deploy.yaml:19). */
final case class PipelineStep(name: String, config: JobConfig, retries: Int = 3)

class PipelineRunner(spark: SparkSession) {
  private val orchestrator = new Orchestrator(spark)

  def run(steps: Seq[PipelineStep]): Unit = steps.foreach(runStep)

  /** O4 concurrency (example-shareprice.py:73 / deploy.yaml:11): groups run
    * in sequence; steps WITHIN a group run concurrently, bounded by
    * `concurrency`. Spark schedules the concurrent jobs fairly on one
    * session; parallel steps must use distinct dataFrameNames (temp views
    * are session-scoped, same as the reference's storage-isolated steps). */
  def runGroups(groups: Seq[Seq[PipelineStep]], concurrency: Int = 4): Unit =
    groups.foreach { group =>
      if (group.sizeIs <= 1) group.foreach(runStep)
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(concurrency, group.size))
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutor(pool)
        try scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(
            group.map(st => scala.concurrent.Future(runStep(st)))),
          scala.concurrent.duration.Duration.Inf)
        finally { pool.shutdown(); () }
      }
    }

  private def runStep(step: PipelineStep): Unit = {
    var attempt = 0
    var done = false
    var lastErr: Throwable = null
    // one token per step EXECUTION, stable across its retry attempts, so
    // committed append sinks are skipped on retry (see Orchestrator.run)
    val token = s"${step.name}_${java.util.UUID.randomUUID().toString.take(8)}"
    while (!done && attempt <= step.retries) {
      try { orchestrator.run(step.config, Some(token)); done = true }
      catch {
        case e: Throwable =>
          lastErr = e; attempt += 1
          System.err.println(s"[pipeline] step ${step.name} attempt $attempt failed: ${e.getMessage}")
      }
    }
    if (!done) throw new IllegalStateException(s"step ${step.name} failed after ${step.retries + 1} attempts", lastErr)
  }
}
