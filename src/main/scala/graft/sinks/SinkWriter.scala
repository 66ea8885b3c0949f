package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.config.SinkSpec
import graft.operators.Scd2
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Phase-3 load strategies and writers (reference:
  * /root/reference/spark.json:68-107). Covers W1 simpleInsert /
  * W2 truncateInsert / W3 scdType2Insert load types (spark.json:73), the
  * file-format surface (spark.json:92), compression (spark.json:93),
  * single-file output with name prefix (spark.json:77-78, W6), partitioned
  * output, JDBC sinks (spark.json:71,74), multi-sink fan-out (the sink
  * section is an array, spark.json:69-96, W10), and the error-record sink
  * (spark.json:97-101, W8).
  *
  * Scale notes: fan-out persists the source frame once and reuses it per
  * sink; singleFile is an explicit opt-in (coalesce(1) is a deliberate
  * bottleneck the reference exposes for small handoff files, not a default);
  * everything else writes with full parallelism and inherits
  * maxRecordsPerFile / partitionBy sizing from conf (spark.json:4-5).
  */
object SinkWriter {

  def write(spark: SparkSession, df: DataFrame, sink: SinkSpec): Unit =
    writeLaid(spark, applyZOrder(df, sink), sink)

  /** Streaming twin of [[write]] (the foreachBatch body): threads the
    * micro-batch id so an at-least-once REPLAY of an scdType2Insert
    * micro-batch against a versioned dimension is detected from the
    * dimension's own commit metadata and skipped whole — no spurious
    * version churn, no re-merge work (the merge content was already
    * idempotent; the version log should be too). Every other load type
    * dispatches exactly like [[write]]. */
  def writeStreamBatch(spark: SparkSession, df: DataFrame, sink: SinkSpec,
      batchId: Long): Unit = {
    val laid = applyZOrder(df, sink)
    val versionedScd2 = sink.loadType.equalsIgnoreCase("scdType2Insert") &&
      sink.options.contains("scdBuckets") && useVersioned(sink)
    if (versionedScd2) {
      scd2InsertPartitioned(spark, laid, sink,
        sink.options("scdBuckets").toInt, batchId = Some(batchId))
      // keep parity with writeLaid's W9 tail: the remote push must not
      // silently drop just because the load dispatched on this branch
      for (rd <- sink.options.get("remoteDirPath"); p <- sink.path)
        graft.sources.SourceReader.remoteFs.upload(p, rd)
    } else writeLaid(spark, laid, sink)
  }

  // W11+ z-order layout pass: one range shuffle + in-partition sort on
  // the interleaved key, applied before any load strategy so every file
  // the writer emits covers a tight (x, y) box (the helper column is
  // dropped; projection preserves the in-partition order)
  private def applyZOrder(df: DataFrame, sink: SinkSpec): DataFrame =
    if (sink.zorderBy.isEmpty) df
    else {
      require(sink.zorderBy.size == 2,
        s"zorderBy takes exactly two integer cell columns, got ${sink.zorderBy}")
      graft.x.Layout.zOrder(df,
        org.apache.spark.sql.functions.col(sink.zorderBy.head),
        org.apache.spark.sql.functions.col(sink.zorderBy(1)),
        zCol = "__graft_z",
        numPartitions = sink.options.get("zorderPartitions").map(_.toInt).getOrElse(0))
        .drop("__graft_z")
    }

  private def writeLaid(spark: SparkSession, df: DataFrame, sink: SinkSpec): Unit = {
    sink.loadType.toLowerCase match {
      case "simpleinsert"   => writeFile(df, sink, SaveMode.valueOf(camel(sink.savemode)))
      case "truncateinsert" => writeFile(df, sink, SaveMode.Overwrite)
      case "scdtype2insert" => scd2Insert(spark, df, sink)
      // maintained aggregate table: fold this batch into the versioned
      // state at `path` (keys/sums from options aggKeys/aggSumCols) —
      // the load strategy form of graft.operators.IncrementalAgg, reused
      // verbatim by streaming foreachBatch
      case "incrementalagginsert" =>
        val keys = sink.options.getOrElse("aggKeys",
          sys.error("incrementalAggInsert needs options.aggKeys")).split(",").map(_.trim).toSeq
        val sums = sink.options.get("aggSumCols").toSeq
          .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
        graft.operators.IncrementalAgg.applyBatch(spark, df,
          sink.path.getOrElse(sys.error(s"sink ${sink.dataFrameName} needs path")),
          keys, sums)
      // MERGE-style upsert into the versioned table: batch rows replace
      // same-key current rows, new keys insert (keys from scdKeys)
      case "upsertinsert" =>
        graft.operators.Upsert.upsert(spark, df,
          sink.path.getOrElse(sys.error(s"sink ${sink.dataFrameName} needs path")),
          sink.scdKeys)
      case other            => sys.error(s"unknown loadType '$other'")
    }
    // W9 sftp sink (spark.json:83-87): push the written output to the
    // remote dir through the RemoteFs transport seam
    for (rd <- sink.options.get("remoteDirPath"); p <- sink.path)
      graft.sources.SourceReader.remoteFs.upload(p, rd)
  }

  // loud on unknown values: a typo'd savemode silently defaulting to Append
  // is the config bug class the dispatch surfaces reject everywhere else
  // (a truncate intent running as append duplicates the target forever)
  private def camel(m: String): String = m.toLowerCase match {
    case "append"        => "Append"
    case "overwrite"     => "Overwrite"
    case "ignore"        => "Ignore"
    case "errorifexists" => "ErrorIfExists"
    case other           =>
      sys.error(s"unknown savemode '$other' (append|overwrite|ignore|errorIfExists)")
  }

  private def writeFile(df: DataFrame, sink: SinkSpec, mode: SaveMode): Unit = {
    if (sink.format == "jdbc") {
      val w = df.write.mode(mode).format("jdbc")
        .option("url", sink.jdbcUrl.getOrElse(""))
        .option("dbtable", sink.tableName.getOrElse(""))
        .options(sink.options)
      // truncateInsert on JDBC: TRUNCATE instead of DROP (W2)
      val w2 = if (mode == SaveMode.Overwrite) w.option("truncate", "true") else w
      w2.save()
      return
    }
    val path = sink.path.getOrElse(sys.error(s"sink ${sink.dataFrameName} needs path"))
    if (sink.format == "deltalake" || sink.format == "delta") {
      // W4 delta sink. Default: versioned-parquet substitute (SURVEY.md
      // §7.4 — the engine's own table layer with CDF/compact/vacuum).
      // option log=delta writes a REAL Delta transaction log instead
      // (DeltaLogWriter), for tables a foreign Delta reader must open;
      // SourceReader auto-detects `_delta_log` and reads either back.
      val m = if (mode == SaveMode.Overwrite) "overwrite" else "append"
      if (sink.options.get("log").contains("delta"))
        graft.sources.DeltaLogWriter.write(df, path, m)
      else
        graft.sources.VersionedParquet.write(df, path, m)
      return
    }
    if (sink.format == "excel" || sink.format == "xlsx") {
      // W4 excel sink (spark.json:92) — small-handoff single file, like W6
      val prefix = sink.outputFileNamePrefix.getOrElse(sink.dataFrameName)
      ExcelSink.write(df, path,
        header = sink.options.get("header").forall(_.toBoolean),
        fileName = s"$prefix.xlsx")
      return
    }
    if (sink.singleFile) { writeSingleFile(df, sink, path); return }
    var w = df.write.mode(mode).format(sink.format).options(sink.options)
    sink.compression.foreach(c => w = w.option("compression", c))
    if (sink.partitionBy.nonEmpty) w = w.partitionBy(sink.partitionBy: _*)
    if (sink.bucketBy.nonEmpty) {
      // Bucketed catalog table: both sides of a future equi-join written
      // with the same bucketing join with ZERO shuffle (SURVEY.md §4). Needs
      // a table identity — use tableName (path rides along as table location).
      val table = sink.tableName.getOrElse(sink.dataFrameName)
      w = w.option("path", path).bucketBy(sink.numBuckets, sink.bucketBy.head, sink.bucketBy.tail: _*)
      if (sink.sortBy.nonEmpty) w = w.sortBy(sink.sortBy.head, sink.sortBy.tail: _*)
      w.saveAsTable(table)
      return
    }
    w.save(path)
  }

  /** W6 single-file output + deterministic name (spark.json:77-78,89):
    * stage via coalesce(1) to a temp dir, then driver-side rename of the
    * part file to `{prefix}_{ts}.{ext}` in the target dir.
    *
    * Single-writer per target path (the duplicateRunCheck guard's job);
    * the stale-staging GC additionally age-gates on mtime so that even
    * two writers racing the same path (overlapping schedules with the
    * guard disabled) can't delete each other's in-flight staging dir —
    * only dirs a crashed run abandoned ≥ 1 h ago are collected. */
  def writeSingleFile(df: DataFrame, sink: SinkSpec, path: String): Unit = {
    // GC staging dirs a crashed earlier run left behind (their names are
    // unique per run, so they would otherwise accumulate forever)
    val target = Paths.get(path.stripSuffix("/"))
    val stalePrefix = target.getFileName.toString + "_staging_"
    val staleBefore = System.currentTimeMillis() - 60L * 60 * 1000
    Option(target.toAbsolutePath.getParent).filter(Files.exists(_)).foreach(parent =>
      graft.util.Fs.list(parent)
        .filter(_.getFileName.toString.startsWith(stalePrefix))
        .filter(p => scala.util.Try(
          Files.getLastModifiedTime(p).toMillis < staleBefore).getOrElse(false))
        .foreach(deleteRecursively))
    val staging = path.stripSuffix("/") + "_staging_" + System.nanoTime()
    var w = df.coalesce(1).write.mode(SaveMode.Overwrite).format(sink.format).options(sink.options)
    sink.compression.foreach(c => w = w.option("compression", c))
    w.save(staging)
    val part = graft.util.Fs.list(Paths.get(staging)).map(_.toString)
      .find(p => p.contains("part-") && !p.endsWith(".crc"))
      .getOrElse(sys.error(s"no part file produced under $staging"))
    val ext = sink.format match {
      case "csv" => "csv"; case "json" => "json"; case "text" => "txt"
      case f => f
    }
    val prefix = sink.outputFileNamePrefix.getOrElse(sink.dataFrameName)
    val ts = java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmss")
      .format(java.time.LocalDateTime.now())
    Files.createDirectories(Paths.get(path))
    Files.move(Paths.get(part), Paths.get(path, s"${prefix}_$ts.$ext"),
      StandardCopyOption.REPLACE_EXISTING)
    deleteRecursively(Paths.get(staging))
  }

  /** W3: read current dimension (if any) from the sink path, merge the
    * staged frame via [[Scd2.merge]], rewrite. First batch initializes.
    * With option `scdBuckets=N`, dispatches to the partition-scoped variant. */
  def scd2Insert(spark: SparkSession, staged: DataFrame, sink: SinkSpec): Unit = {
    sink.options.get("scdBuckets") match {
      case Some(n) => scd2InsertPartitioned(spark, staged, sink, n.toInt); return
      case None    =>
    }
    val path = sink.path.getOrElse(sys.error("scd2 sink needs path"))
    recoverScd2Swap(path)
    val batchTs = java.sql.Timestamp.from(java.time.Instant.now())
    val merged =
      if (graft.util.Fs.nonEmptyDir(Paths.get(path))) {
        // re-read WITH the sink's options (the reconcile path's rule): a
        // csv dimension read without `header` would merge its header row
        // as data
        val dim = spark.read.format(sink.format).options(sink.options).load(path)
        Scd2.merge(dim, staged, sink.scdKeys, sink.scdTrackedCols, batchTs)
      } else Scd2.initialize(staged, batchTs)
    // Rewrite via staging dir then swap — the source of the read and the
    // target of the write are the same path, so a direct overwrite would
    // truncate its own input mid-plan. Swap order (ADVICE r1): move the old
    // dim ASIDE (not delete-first), move staging in, then drop the old copy
    // — a crash at any point leaves either the old or the new dimension on
    // disk, and recoverScd2Swap on the next run completes the interrupted
    // step instead of starting from an empty table.
    val staging = path.stripSuffix("/") + "_scd2_staging"
    val old = path.stripSuffix("/") + "_scd2_old"
    merged.write.mode(SaveMode.Overwrite).format(sink.format).save(staging)
    deleteRecursively(Paths.get(old)) // stale leftover from an earlier crash
    if (Files.exists(Paths.get(path))) Files.move(Paths.get(path), Paths.get(old))
    Files.move(Paths.get(staging), Paths.get(path))
    deleteRecursively(Paths.get(old))
  }

  /** Startup recovery for an interrupted scd2Insert swap: if the dimension
    * path is missing but the staging (complete merged frame — writes finish
    * before the swap begins) or the moved-aside copy survives, restore it. */
  private def recoverScd2Swap(path: String): Unit = {
    val p = Paths.get(path.stripSuffix("/"))
    val staging = Paths.get(path.stripSuffix("/") + "_scd2_staging")
    val old = Paths.get(path.stripSuffix("/") + "_scd2_old")
    if (!Files.exists(p) && Files.exists(staging) && Files.exists(old)) {
      Files.move(staging, p); deleteRecursively(old)
    } else if (!Files.exists(p) && Files.exists(old)) {
      Files.move(old, p)
    }
  }

  /** W3 at 100 TB (SURVEY.md §4/§7.4): the dimension is written partitioned
    * by a stable bucket of the business key (`scd_bucket = pmod(xxhash64(keys), N)`).
    * A batch then (1) computes the buckets its staged keys land in, (2)
    * reads ONLY those dimension partitions (partition pruning), (3) merges,
    * and (4) rewrites only the touched partitions via dynamic partition
    * overwrite. Untouched partitions — at real scale, the overwhelming
    * majority — are never read or rewritten.
    *
    * The merged frame MUST be materialized before the overwrite (its
    * lineage reads the same files the write replaces), and the
    * materialization is load-bearing: once the overwrite starts renaming
    * source partitions aside, losing the materialized copy loses the
    * merge. HOW it is materialized goes through the [[graft.util.Staging]]
    * seam — local checkpoint by default (single-node semantics), or a
    * durable staged table when the sink carries `scdStagingPath` (cluster
    * semantics: executor loss mid-overwrite cannot drop pinned blocks the
    * rewrite still needs; the staged merge survives for replay). The
    * staged scratch is cleaned up only AFTER the overwrite commits.
    *
    * Since r14 the VERSIONED store is the default for partitioned SCD2:
    * the dimension is fronted by a [[graft.sources.VersionedParquet]]
    * manifest, so the touched partitions commit in ONE atomic manifest
    * rename (all-old or all-new, never mixed — asserted by
    * Scd2PartitionedSpec's crash injection), a crash leaves only an
    * unreferenced data dir, no merge materialization is needed at all
    * (a versioned write never overwrites the files its own lineage
    * reads), and concurrent merges are conflict-checked at commit
    * (disjoint buckets interleave; overlapping buckets → one winner,
    * one loud abort). Versioned dimensions are READ via
    * `VersionedParquet.read(path)`, not a raw directory scan.
    *
    * `scdVersioned=false` keeps the legacy dynamic-partition-overwrite
    * layout, for consumers that must scan the dimension as a raw hive
    * directory. Its crash contract is weaker: the overwrite commits per
    * partition (delete-then-rename inside Spark's committer), so a
    * driver crash mid-commit can leave SOME touched partitions at the
    * new version and others missing; recovery is a re-run from the
    * durable `scdStagingPath` scratch (the merge survives, and SCD2
    * re-merge is idempotent). Auto-detection keeps existing tables on
    * the layout they were created with — see [[useVersioned]]. */
  def scd2InsertPartitioned(spark: SparkSession, staged: DataFrame, sink: SinkSpec,
      nBuckets: Int, midCommitHook: () => Unit = () => (),
      batchId: Option[Long] = None): Unit = {
    if (useVersioned(sink)) {
      scd2InsertPartitionedVersioned(spark, staged, sink, nBuckets,
        midCommitHook, batchId)
      return
    }
    val path = sink.path.getOrElse(sys.error("scd2 sink needs path"))
    val batchTs = java.sql.Timestamp.from(java.time.Instant.now())
    val keys = sink.scdKeys
    val bucket = pmod(xxhash64(keys.map(col): _*), lit(nBuckets)).cast("int")
    val stagedB = staged.withColumn("scd_bucket", bucket)
    val exists = graft.util.Fs.nonEmptyDir(Paths.get(path))
    val pathStaging = sink.options.get("scdStagingPath")
      .map(new graft.util.Staging.PathStaging(_))
    val staging: graft.util.Staging =
      pathStaging.getOrElse(graft.util.Staging.LocalCheckpoint)
    val prevMode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // route each bucket's rows into one task before the partitioned
      // write: without it every task holds rows of every touched bucket
      // and each merge emits O(tasks × buckets) files (at cluster scale,
      // millions of small files per merge — the same defect the
      // versioned path's stagePartitioned fix measured at 89 s → 3 s)
      if (!exists) {
        Scd2.initialize(stagedB, batchTs)
          .repartition(col("scd_bucket"))
          .write.mode(SaveMode.Overwrite).partitionBy("scd_bucket")
          .format(sink.format).save(path)
      } else {
        val touched = stagedB.select("scd_bucket").distinct()
          .collect().map(_.getInt(0)).toSeq
        val dimTouched = spark.read.format(sink.format).options(sink.options).load(path)
          .filter(col("scd_bucket").isin(touched: _*))
        val merged = Scd2.merge(dimTouched, stagedB, keys,
          sink.scdTrackedCols, batchTs)
        staging.stage(merged, "scd2-merged")
          .repartition(col("scd_bucket"))
          .write.mode(SaveMode.Overwrite).partitionBy("scd_bucket")
          .format(sink.format).save(path)
      }
      pathStaging.foreach(_.cleanup()) // only after the overwrite commits
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prevMode)
  }

  /** Which store layout a partitioned SCD2 sink uses. Explicit option
    * wins (`scdVersioned=true|false`, anything else is a loud config
    * error — the registry's typo rule); otherwise AUTO-DETECT so the
    * r14 default flip can't corrupt an existing deployment: a table
    * carrying a `_graft_log` is versioned, a non-empty raw directory
    * stays on the legacy dynamic-overwrite layout it was created with,
    * and a FRESH table gets the versioned store (strictly safer:
    * one-rename atomic commit, probe-proven flat merge cost). */
  private def useVersioned(sink: SinkSpec): Boolean =
    sink.options.get("scdVersioned") match {
      case Some(v) if v.equalsIgnoreCase("true")  => true
      case Some(v) if v.equalsIgnoreCase("false") => false
      case Some(v) => sys.error(
        s"scdVersioned='$v' is not a boolean (true|false)")
      case None =>
        val path = sink.path.getOrElse(sys.error("scd2 sink needs path"))
        Files.exists(Paths.get(path, "_graft_log")) ||
          !graft.util.Fs.nonEmptyDir(Paths.get(path))
    }

  /** The versioned branch of [[scd2InsertPartitioned]] (the default since
    * r14): same bucketing, same partition-pruned merge, but the store is
    * a [[graft.sources.VersionedParquet]] table — the rewrite of the
    * touched buckets publishes as ONE manifest rename, so a reader (or a
    * crash) can never observe some buckets at the new version and others
    * at the old. The merge needs no materialization seam here: the write
    * targets a fresh immutable data dir, never the files its lineage
    * reads.
    *
    * Concurrency: the merge captures the snapshot version it READS and
    * passes it to `overwritePartitions` as the optimistic base — a
    * concurrent merge that committed an overlapping bucket in between
    * makes THIS commit abort loudly instead of silently dropping the
    * other's update; merges over disjoint buckets interleave freely.
    *
    * Conflict handling: the DEFAULT on a detected write-write conflict
    * is the loud typed abort (`VersionedParquet.ConflictException`) —
    * nothing published, re-run converges. With option
    * `scdConflictRetries=N` the writer instead re-reads the touched
    * buckets at the advanced version and re-merges, up to N times (the
    * bounded optimistic-retry loop a deployment with overlapping
    * schedulers opts into; each retry logs the conflict it absorbed).
    * Retries re-merge against the OTHER writer's committed rows, so no
    * update is ever lost either way — the option only trades operator
    * intervention for bounded extra work under contention.
    *
    * Streaming replays (`batchId` from foreachBatch): each commit carries
    * the monotone high-watermark `scd2BatchHwm = max(batchId, prev hwm)`
    * in its manifest meta; a batch at or below the newest tagged hwm has
    * completed WHOLE (micro-batch ids are strictly increasing and
    * foreachBatch runs sequentially) and is skipped — one manifest-meta
    * read, no Spark job (the [[graft.streaming.StreamingJobs
    * .incrementalNearDupBatch]] contract, including its backward scan
    * past untagged maintenance commits). */
  private def scd2InsertPartitionedVersioned(spark: SparkSession,
      staged: DataFrame, sink: SinkSpec, nBuckets: Int,
      midCommitHook: () => Unit, batchId: Option[Long]): Unit = {
    import graft.sources.VersionedParquet
    val path = sink.path.getOrElse(sys.error("scd2 sink needs path"))
    // replay guard first: one manifest read, before any Spark job
    val prevHwm = scd2Hwm(path)
    if (batchId.exists(_ <= prevHwm)) return
    // the hwm rides every subsequent commit so maintenance commits (or
    // batch merges interleaved with streaming ones) can't bury it
    val hwmMeta = batchId.map(b => math.max(b, prevHwm)).orElse(
      if (prevHwm >= 0) Some(prevHwm) else None)
      .map(h => Map("scd2BatchHwm" -> h.toString)).getOrElse(Map.empty)
    val batchTs = java.sql.Timestamp.from(java.time.Instant.now())
    val keys = sink.scdKeys
    val bucket = pmod(xxhash64(keys.map(col): _*), lit(nBuckets)).cast("int")
    val stagedB = staged.withColumn("scd_bucket", bucket)
    if (VersionedParquet.versions(path).isEmpty) {
      // an empty FIRST batch must not commit: a zero-file manifest would
      // make the next merge's readPartitions return an empty-schema frame
      // and fail with an unresolved-column puzzle instead of initializing
      // (ADVICE r13) — mirror the merge branch's empty-batch no-op
      if (staged.isEmpty) return
      VersionedParquet.writePartitioned(
        Scd2.initialize(stagedB, batchTs), path, "scd_bucket", hwmMeta)
    } else {
      val touched = stagedB.select("scd_bucket").distinct()
        .collect().map(_.getInt(0)).toSeq.sorted
      if (touched.isEmpty) return // empty batch: nothing to merge (matches
      // the dynamic-overwrite path, which writes no partition either)
      val retries = sink.options.get("scdConflictRetries").map(_.toInt).getOrElse(0)
      var attempt = 0
      var done = false
      while (!done) {
        val base = VersionedParquet.versions(path).max
        val dimTouched = VersionedParquet.readPartitions(
          spark, path, touched.map(_.toString), Some(base))
        val merged = Scd2.merge(dimTouched, stagedB, keys,
          sink.scdTrackedCols, batchTs)
        try {
          VersionedParquet.overwritePartitions(merged, path, "scd_bucket",
            touched.map(_.toString), Some(base), hwmMeta, midCommitHook)
          done = true
        } catch {
          case e: VersionedParquet.ConflictException if attempt < retries =>
            attempt += 1
            println(s"[scd2] conflict on $path (attempt $attempt/$retries), " +
              s"re-merging at the advanced version: ${e.getMessage.take(120)}")
        }
      }
    }
  }

  /** Newest committed `scd2BatchHwm` of a versioned dimension (−1 when
    * none): scan backwards to the newest TAGGED manifest so an untagged
    * maintenance commit can't reset the replay watermark. */
  private def scd2Hwm(path: String): Long =
    graft.sources.VersionedParquet.versions(path).reverse.iterator
      .map(v => graft.sources.VersionedParquet.commitMeta(path, v)
        .get("scd2BatchHwm")
        .flatMap(s => scala.util.Try(s.toLong).toOption))
      .collectFirst { case Some(t) => t }.getOrElse(-1L)

  /** W10 multi-sink fan-out (spark.json:69-96): persist once, write N times. */
  def fanOut(spark: SparkSession, df: DataFrame, sinks: Seq[SinkSpec]): Unit = {
    if (sinks.size <= 1) { sinks.foreach(write(spark, df, _)); return }
    val cached = df.persist()
    try sinks.foreach(write(spark, cached, _))
    finally { cached.unpersist(); () }
  }

  /** W8 error-record sink (spark.json:97-101): `bad` frames already carry
    * `error_reason`; stamp the job + time and write with the same machinery. */
  def writeErrors(spark: SparkSession, bad: DataFrame, jobName: String, sink: SinkSpec): Unit = {
    val stamped = bad
      .withColumn("error_job", lit(jobName))
      .withColumn("error_ts", current_timestamp())
    write(spark, stamped, sink)
  }

  /** W12 archive-input-after-load (spark.json:10-12). */
  def archiveInput(inputPath: String, archivePath: String, deleteSource: Boolean): Unit = {
    val src = Paths.get(inputPath)
    if (!Files.exists(src)) return
    Files.createDirectories(Paths.get(archivePath))
    val dest = Paths.get(archivePath, src.getFileName.toString)
    if (deleteSource) Files.move(src, dest, StandardCopyOption.REPLACE_EXISTING)
    else copyRecursively(src, dest)
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    graft.util.Fs.walk(p).sortBy(_.toString)(Ordering[String].reverse)
      .foreach(Files.delete)

  private def copyRecursively(src: java.nio.file.Path, dest: java.nio.file.Path): Unit =
    graft.util.Fs.walk(src).foreach { p =>
      val target = dest.resolve(src.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(target)
      else {
        Files.createDirectories(target.getParent)
        Files.copy(p, target, StandardCopyOption.REPLACE_EXISTING)
      }
    }
}
