package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** S9/W4 `deltalake` format substitute (SURVEY.md §7.4: the real
  * delta-spark package can't resolve in the zero-egress build, so the
  * engine ships a parquet-dir-plus-manifest table with the same user-facing
  * semantics at this surface: atomic append/overwrite commits, snapshot
  * isolation for readers, and time travel by version).
  *
  * Layout:
  *   <path>/_graft_log/<version>.json   — ordered commit manifests, each the
  *                                        COMPLETE file list of its snapshot
  *   <path>/data/c-<uuid>/              — immutable data dirs per commit
  *
  * A reader lists the log, picks the requested (default: latest) version,
  * and reads exactly that manifest's files — writers never mutate existing
  * data dirs, so concurrent readers see a consistent snapshot. Commit
  * atomicity: the manifest is staged and atomically moved into the log,
  * so a crashed write leaves only unreferenced data (same recovery model
  * as a real table format's uncommitted files).
  *
  * Concurrency (ENFORCED since r14; full rules: PLANS.md "Store
  * concurrency contracts"): readers always safe. Writers serialize the
  * metadata critical section — version allocation, carried-file
  * computation, conflict check, manifest publish — on one per-table
  * `.commit.lock` (atomic create; the Spark data write stays OUTSIDE
  * the lock, so staging runs with full parallelism). Consequences:
  *  - concurrent APPENDs linearize: each computes its carried file list
  *    inside the lock, from the latest published manifest, so neither
  *    append's files can be lost no matter how the stages interleave;
  *  - concurrent [[overwritePartitions]] commits carrying a
  *    `baseVersion` are OPTIMISTICALLY checked: a commit whose touched
  *    partitions were modified by an intervening commit ABORTS loudly
  *    (naming the conflicting version) instead of silently replacing
  *    the other writer's update; DISJOINT-partition commits interleave
  *    freely (the carried list re-reads the latest manifest, keeping
  *    the other commit's files);
  *  - [[compact]] aborts if the table advanced between its snapshot
  *    read and its commit (its rewrite would drop the newer commit).
  * A crashed lock holder leaves a stale `.commit.lock`; waiters reclaim
  * it after `staleLockMs` (the critical section is milliseconds of
  * driver-side metadata work, so a lock that old is always abandoned).
  */
object VersionedParquet {

  /** A write-write conflict detected at commit: an intervening commit
    * touched this writer's partitions (or advanced past a compaction's
    * snapshot). The staged data dir is left unreferenced (vacuum's
    * orphan pass reclaims it); re-reading and re-running converges.
    * Typed so callers can implement bounded retry without string
    * matching. */
  final class ConflictException(msg: String) extends RuntimeException(msg)

  private def logDir(path: String) = Paths.get(path, "_graft_log")

  /** Committed versions, ascending. */
  def versions(path: String): Seq[Long] =
    graft.util.Fs.list(logDir(path))
      .map(_.getFileName.toString).filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toLong).sorted

  private def manifestFiles(path: String, version: Long): Seq[String] = {
    val txt = new String(Files.readAllBytes(logDir(path).resolve(s"$version.json")), "UTF-8")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(txt)
    node.get("files").elements().asScala.map(_.asText()).toSeq
  }

  /** Number of data files in the latest committed snapshot — the signal
    * maintenance schedules on: appends only ever grow it, [[compact]]
    * resets it to its target. */
  def snapshotFileCount(path: String): Int = {
    val vs = versions(path)
    if (vs.isEmpty) 0 else manifestFiles(path, vs.max).size
  }

  /** Snapshot read; `version = None` reads the latest commit. */
  def read(spark: SparkSession, path: String, version: Option[Long] = None): DataFrame = {
    val vs = versions(path)
    require(vs.nonEmpty, s"no committed versions under $path")
    val v = version.getOrElse(vs.max)
    require(vs.contains(v), s"version $v not in committed versions $vs")
    val files = manifestFiles(path, v)
    if (files.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(files: _*)
  }

  /** Change-data-feed read: every row added or removed by the commits in
    * `(fromVersion, toVersion]`, tagged `_change_type` ("insert" |
    * "delete") and `_commit_version` — the incremental-consumption surface
    * a downstream pipeline step uses instead of re-reading the whole table
    * (delta's CDF semantics, derived purely from manifest diffs).
    *
    * Because data dirs are immutable, the diff of two manifests IS the
    * change set: files only in the newer manifest carry inserted rows,
    * files only in the older carry deleted rows (an overwrite lists every
    * previous file as removed). Cost is proportional to the CHANGED files
    * — at 100 TB an incremental consumer reads the day's appends, never
    * the accumulated table. */
  def readChanges(spark: SparkSession, path: String,
      fromVersion: Long, toVersion: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions.{lit, col}
    val vs = versions(path)
    require(vs.nonEmpty, s"no committed versions under $path")
    val to = toVersion.getOrElse(vs.max)
    // Guard against vacuumed history (ADVICE r2): versions number from 0, so
    // an oldest retained version > 0 means its predecessors were vacuumed.
    // Diffing the oldest survivor against None would tag the ENTIRE carried
    // snapshot "insert" — an incremental consumer whose watermark predates
    // retention would silently double-count every carried row. Fail loudly
    // instead (Delta's CDF errors here too rather than fabricating a delta).
    require(fromVersion >= vs.min || vs.min == 0L,
      s"history vacuumed past requested change range: fromVersion=$fromVersion " +
        s"but oldest retained version under $path is ${vs.min}; re-seed from a " +
        s"snapshot read instead of the change feed")
    val range = vs.filter(v => v > fromVersion && v <= to)
    val frames = range.flatMap { v =>
      val prev = vs.filter(_ < v).lastOption.map(manifestFiles(path, _)).getOrElse(Nil).toSet
      val cur = manifestFiles(path, v).toSet
      def tagged(files: Set[String], change: String): Option[DataFrame] =
        if (files.isEmpty) None
        else Some(spark.read.parquet(files.toSeq: _*)
          .withColumn("_change_type", lit(change))
          .withColumn("_commit_version", lit(v)))
      tagged(cur -- prev, "insert") ++ tagged(prev -- cur, "delete")
    }
    frames.reduceOption(_ unionByName _).getOrElse {
      read(spark, path).limit(0)
        .withColumn("_change_type", lit(""))
        .withColumn("_commit_version", lit(0L))
    }.select(col("*"))
  }

  /** Compact the latest snapshot into `targetFiles` files, committed as a
    * new version — the small-file maintenance op: a 100 TB table fed by
    * frequent small appends accumulates footer/open overhead per file
    * until scans are metadata-bound; compaction rewrites the CURRENT
    * snapshot only, never history (old versions still time-travel).
    * No-op when the snapshot is already at or under the target.
    * Note for change-feed consumers: compaction rewrites every file, so
    * `readChanges` across it reports a full delete+insert — downstream
    * incremental consumers converge (delta algebra cancels) but pay a
    * snapshot-sized delta; schedule compaction right after a refresh.
    * The compacted commit CARRIES FORWARD the replaced snapshot's commit
    * metadata verbatim: compaction is a physical rewrite of the same
    * logical snapshot, and consumers that key replay/watermark state off
    * the newest version's meta (the streaming near-dedup's
    * `streamBatchHwm`) must not lose it to a maintenance op. */
  def compact(spark: SparkSession, path: String, targetFiles: Int = 1,
      midCommitHook: () => Unit = () => ()): Unit = {
    require(targetFiles >= 1, "targetFiles must be >= 1")
    val vs = versions(path)
    require(vs.nonEmpty, s"no committed versions under $path")
    val snapshot = manifestFiles(path, vs.max)
    // a partition-scoped table's layout invariant (every file attributable
    // to its partition via the path segment) would be silently destroyed
    // by this whole-snapshot rewrite — the breakage would only surface at
    // the NEXT overwritePartitions. Refuse up front instead; per-partition
    // file counts are already bounded (each partial commit fully rewrites
    // its touched partitions) and history reclamation is vacuum's job.
    require(!snapshot.exists(_.contains(s"/$PartDir=")),
      s"compact($path): partition-scoped table (files carry $PartDir= " +
        "segments) — whole-snapshot compaction would break partition " +
        "attribution for overwritePartitions; vacuum old versions instead")
    if (snapshot.size <= targetFiles) return
    // conflict check: an append landing between the snapshot read above
    // and this commit would be DROPPED by the rewrite (the staged frame
    // was planned from the old snapshot) — abort loudly instead; the
    // caller re-runs against the advanced table
    val base = vs.max
    val df = read(spark, path).repartition(targetFiles)
    commitVersion(path, commitMeta(path, base),
      stage = dataDir => {
        df.write.mode("errorifexists").parquet(dataDir)
        graft.util.Fs.list(Paths.get(dataDir))
          .map(_.toString).filter(_.endsWith(".parquet"))
      },
      carried = _ => Nil,
      midCommitHook = midCommitHook,
      conflictCheck = latest =>
        if (latest != base) throw new ConflictException(
          s"compact($path): concurrent commit detected — snapshot was " +
            s"read at version $base but version $latest is now the " +
            "latest; the rewrite would drop the intervening commit. " +
            "Re-run compaction against the advanced table."))
  }

  /** Drop history: delete manifests older than the last `keepVersions`
    * commits and every data file no surviving manifest references. The
    * storage-reclamation sibling of [[compact]] — after it, time travel
    * reaches only the kept versions. Runs driver-side (file listing +
    * deletes); at object-store scale the same walk batches into bulk
    * deletes. Returns the number of data files removed.
    *
    * Also collects ORPHANED data dirs — staged by a commit that crashed
    * or ABORTED on a conflict (r14: optimistic concurrency makes aborts
    * a normal outcome, so orphans accumulate by design, not only by
    * crash) and referenced by no manifest at all. A dir is an orphan
    * only when no kept manifest references it AND nothing inside it was
    * modified within `orphanGraceMs` — the grace period is what protects
    * a concurrent commit's IN-FLIGHT stage (which runs outside the
    * commit lock); size it above the longest plausible data stage. */
  def vacuum(path: String, keepVersions: Int = 1,
      orphanGraceMs: Long = 24L * 3600 * 1000): Int = {
    require(keepVersions >= 1, "must keep at least the latest version")
    require(orphanGraceMs >= 0, "orphanGraceMs must be >= 0")
    // log mutation → same critical section as a commit: the retained
    // window and the live-file set must be computed against a log no
    // concurrent commit is extending mid-walk
    withCommitLock(path) {
      val vs = versions(path)
      val (dropped, kept) = vs.splitAt((vs.size - keepVersions).max(0))
      val keptFiles = kept.flatMap(manifestFiles(path, _)).toSet
      val dead = dropped.flatMap(manifestFiles(path, _)).toSet -- keptFiles
      dead.foreach(f => Files.deleteIfExists(Paths.get(f)))
      dropped.foreach(v => Files.deleteIfExists(logDir(path).resolve(s"$v.json")))
      // orphan collection: data dirs referenced by NO surviving manifest
      val dataRoot = Paths.get(path, "data")
      val referenced = keptFiles.flatMap { f =>
        val i = f.indexOf("/data/")
        if (i < 0) None else Some(f.substring(i + 6).takeWhile(_ != '/'))
      }
      val cutoff = System.currentTimeMillis() - orphanGraceMs
      val orphaned =
        if (!Files.exists(dataRoot)) 0
        else graft.util.Fs.list(dataRoot)
          .filter(d => !referenced.contains(d.getFileName.toString))
          .filter { d =>
            val newest = graft.util.Fs.walk(d).map(p =>
              scala.util.Try(Files.getLastModifiedTime(p).toMillis)
                .getOrElse(Long.MaxValue))
            newest.nonEmpty && newest.max < cutoff
          }
          .map { d =>
            val files = graft.util.Fs.walk(d).count(p => !Files.isDirectory(p))
            graft.util.Fs.walk(d).sortBy(_.toString)(Ordering[String].reverse)
              .foreach(Files.deleteIfExists)
            files
          }.sum
      dead.size + orphaned
    }
  }

  /** Commit-level metadata of `version` (empty for commits written before
    * metadata existed, or when none was attached). Reading it is a log
    * lookup — NO Spark job, no data-file open: the cheap channel for
    * transactional bookkeeping like [[graft.operators.IncrementalAgg]]'s
    * refresh watermark (the same role Delta's `txn` action plays). */
  def commitMeta(path: String, version: Long): Map[String, String] = {
    val txt = new String(Files.readAllBytes(logDir(path).resolve(s"$version.json")), "UTF-8")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(txt)
    Option(node.get("meta")).map { m =>
      m.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    }.getOrElse(Map.empty)
  }

  def write(df: DataFrame, path: String, mode: String): Unit =
    write(df, path, mode, Map.empty[String, String])

  /** Like [[write]], with `meta` key-values embedded in the commit
    * manifest itself — state and bookkeeping become atomic by
    * construction (one rename publishes both). */
  def write(df: DataFrame, path: String, mode: String, meta: Map[String, String]): Unit = {
    mode.toLowerCase match {
      case "append" | "overwrite" =>
      case m => sys.error(s"versioned table supports append|overwrite, got '$m'")
    }
    commitVersion(path, meta,
      stage = dataDir => {
        df.write.mode("errorifexists").parquet(dataDir)
        graft.util.Fs.list(Paths.get(dataDir))
          .map(_.toString).filter(_.endsWith(".parquet"))
      },
      carried = prev =>
        if (mode.equalsIgnoreCase("append"))
          prev.map(manifestFiles(path, _)).getOrElse(Nil)
        else Nil)
  }

  /** Directory name partition-scoped commits key file attribution on: the
    * partition value rides in the PATH (manifest-level pruning) while the
    * original column stays IN the data files — readers of explicit file
    * lists never lose it to hive-partition stripping. */
  private val PartDir = "__part"

  private def partSeg(v: String) = s"/$PartDir=$v/"

  /** Partition values ride in directory names and are matched back by
    * raw substring, so a value Spark would hive-escape (space, '=', '%',
    * '/') would silently match NOTHING on read (ADVICE r13) — reject it
    * up front, at every entry point that takes one. */
  private def requireDirSafe(values: Seq[String], op: String): Unit =
    values.filterNot(_.matches("[A-Za-z0-9_.-]+")) match {
      case Seq() =>
      case bad => throw new IllegalArgumentException(
        s"$op: partition value(s) ${bad.map("'" + _ + "'").mkString(", ")} " +
          "are not directory-safe — the partition-scoped layout matches " +
          "values by path segment and only [A-Za-z0-9_.-]+ round-trips " +
          "(hive-escaped characters would silently match nothing on read)")
    }

  /** Full-overwrite commit in the partition-scoped layout — the
    * initialization sibling of [[overwritePartitions]] (every later
    * partial commit requires the table's files to carry the partition
    * path segment this writes). `partitionCol` values must be
    * directory-safe (ints or simple strings — enforced from the staged
    * directory names, pre-publish). */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String,
      meta: Map[String, String] = Map.empty): Unit = {
    commitVersion(path, meta,
      stage = dataDir => {
        val files = stagePartitioned(df, partitionCol, dataDir)
        requireDirSafe(stagedPartValues(files), s"writePartitioned($path)")
        files
      },
      carried = _ => Nil)
  }

  /** Partition values present in a freshly-staged file list, decoded
    * from the directory names. */
  private def stagedPartValues(files: Seq[String]): Seq[String] =
    files.flatMap { f =>
      val i = f.indexOf(s"/$PartDir=")
      if (i < 0) None
      else Some(f.substring(i + PartDir.length + 2).takeWhile(_ != '/'))
    }.distinct

  /** Stage a partition-scoped data dir: one hash shuffle on the partition
    * column routes each partition's rows into one task, so a commit
    * writes O(#partitions) files instead of O(tasks × partitions) — the
    * small-files explosion that otherwise compounds per merge (measured:
    * a 3.2 M-row dimension merge dropped 89 s → seconds). A partition
    * bigger than one task wants more buckets, not more files — the same
    * `nBuckets` tracks-dimension-size rule the SCD2 scaladoc states. */
  private def stagePartitioned(df: DataFrame, partitionCol: String,
      dataDir: String): Seq[String] = {
    import org.apache.spark.sql.functions.col
    df.withColumn(PartDir, col(partitionCol))
      .repartition(col(PartDir))
      .write.mode("errorifexists").partitionBy(PartDir).parquet(dataDir)
    listDataFiles(dataDir)
  }

  /** ATOMIC multi-partition overwrite: commit a new version whose
    * manifest replaces only the files under `partitionCol = v` for v in
    * `touched`, carrying every other partition's files forward verbatim.
    * ONE manifest rename publishes all touched partitions together — a
    * reader sees the whole commit or none of it, closing the
    * mixed-version window Spark's dynamic partition overwrite leaves on
    * a crash mid-commit (the [[graft.sinks.SinkWriter.scd2InsertPartitioned]]
    * crash contract). A crash anywhere before the rename leaves only an
    * unreferenced data dir; re-running the operation converges.
    *
    * Requires the table to have been written partition-scoped
    * ([[writePartitioned]] / this method): a carried file without the
    * partition path segment cannot be attributed to a partition, so the
    * commit fails loudly rather than guessing. `midCommitHook` is the
    * crash-injection seam ([[graft.x.Similarity.rebuildIvfLayout]]'s
    * `midRebuildHook` pattern): fired after the data write, before the
    * manifest publish (and before the commit lock, so an interleaving
    * test can commit from inside it).
    *
    * Optimistic concurrency (`baseVersion` = the version the caller's
    * merge READ, e.g. from [[readPartitions]]): inside the commit lock,
    * if any commit published since `baseVersion` modified a TOUCHED
    * partition, this commit ABORTS loudly naming the conflicting version
    * — publishing would silently replace that writer's update with a
    * merge that never saw it. Commits touching DISJOINT partitions
    * interleave freely: the carried list is rebuilt from the latest
    * manifest, so their files ride along untouched. `baseVersion = None`
    * skips the check (single-writer callers). `meta` lands in the commit
    * manifest ([[commitMeta]]) — the at-least-once replay tag channel. */
  def overwritePartitions(df: DataFrame, path: String, partitionCol: String,
      touched: Seq[String], baseVersion: Option[Long] = None,
      meta: Map[String, String] = Map.empty,
      midCommitHook: () => Unit = () => ()): Unit = {
    require(touched.nonEmpty, "overwritePartitions needs at least one touched partition")
    requireDirSafe(touched, s"overwritePartitions($path)")
    def touchedFiles(files: Seq[String]): Set[String] =
      files.filter(f => touched.exists(t => f.contains(partSeg(t)))).toSet
    commitVersion(path, meta,
      stage = dataDir => {
        val files = stagePartitioned(df, partitionCol, dataDir)
        // rows OUTSIDE the touched set would publish beside the carried
        // old files of their partitions — silent duplication. Checked
        // from the staged directory names (driver-side, pre-publish:
        // nothing is committed yet, so failing here is a clean abort).
        val stagedParts = stagedPartValues(files)
        requireDirSafe(stagedParts, s"overwritePartitions($path)")
        val stray = stagedParts.filterNot(touched.contains)
        require(stray.isEmpty,
          s"overwritePartitions($path): frame contains partitions " +
            s"${stray.sorted.mkString(", ")} outside touched=" +
            s"${touched.sorted.mkString(", ")} — their rows would " +
            "duplicate the carried files; widen `touched` or filter the frame")
        files
      },
      carried = prev => {
        val prevFiles = prev.map(manifestFiles(path, _)).getOrElse(Nil)
        prevFiles.foreach(f => require(f.contains(s"/$PartDir="),
          s"overwritePartitions($path): carried file $f has no $PartDir= " +
            "segment — the table was not written partition-scoped " +
            "(initialize with writePartitioned)"))
        prevFiles.filterNot(f => touched.exists(t => f.contains(partSeg(t))))
      },
      midCommitHook = midCommitHook,
      conflictCheck = latest => baseVersion.foreach { base =>
        val vs = versions(path)
        require(vs.contains(base),
          s"overwritePartitions($path): baseVersion $base is not a " +
            s"committed version (have $vs) — vacuumed mid-merge?")
        if (latest != base &&
            touchedFiles(manifestFiles(path, base)) !=
            touchedFiles(manifestFiles(path, latest))) {
          // name the first intervening commit that touched the overlap —
          // the operator's breadcrumb for WHICH writer won
          val conflicting = vs.filter(v => v > base && v <= latest).find(v =>
            touchedFiles(manifestFiles(path, v)) !=
              touchedFiles(manifestFiles(path,
                vs.filter(_ < v).last))).getOrElse(latest)
          throw new ConflictException(
            s"overwritePartitions($path): write-write conflict — this " +
              s"merge read version $base but commit $conflicting modified " +
              s"touched partition(s) of ${touched.sorted.mkString("{", ",", "}")} " +
              s"(latest is $latest). Publishing would silently drop that " +
              "commit's update; re-read the touched partitions and re-merge.")
        }
      })
  }

  /** Snapshot read of ONLY the partitions holding `touched` values —
    * manifest-level pruning: non-touched partitions' files are filtered
    * from the file list driver-side, never opened. Empty result (schema
    * from the full snapshot) when no touched partition exists yet. */
  def readPartitions(spark: SparkSession, path: String, touched: Seq[String],
      version: Option[Long] = None): DataFrame = {
    requireDirSafe(touched, s"readPartitions($path)")
    val vs = versions(path)
    require(vs.nonEmpty, s"no committed versions under $path")
    val v = version.getOrElse(vs.max)
    val files = manifestFiles(path, v)
      .filter(f => touched.exists(t => f.contains(partSeg(t))))
    if (files.isEmpty) read(spark, path, Some(v)).limit(0)
    else spark.read.parquet(files: _*)
  }

  /** All parquet data files under a (possibly partition-subdivided)
    * freshly-staged data dir. */
  private def listDataFiles(dataDir: String): Seq[String] =
    graft.util.Fs.walk(Paths.get(dataDir))
      .map(_.toString).filter(_.endsWith(".parquet"))

  /** How long a `.commit.lock` may sit before waiters treat its holder
    * as crashed and reclaim it. The guarded section is milliseconds of
    * driver-side metadata work — a lock minutes old is always abandoned
    * (a process that died between create and the `finally` delete). */
  private[graft] val staleLockMs: Long = 10L * 60 * 1000
  private val lockWaitMs: Long = 60L * 1000

  /** Serialize the per-table metadata critical section on an atomic
    * `createFile(.commit.lock)`. Stale locks (crashed holder) are
    * reclaimed after [[staleLockMs]]; a lock CONTENDED longer than
    * `lockWaitMs` fails loudly naming the file — at that point either
    * the holder hung mid-commit (inspect, then delete the lock) or
    * commit traffic is high enough that the caller should back off. */
  private def withCommitLock[A](path: String)(body: => A): A = {
    Files.createDirectories(logDir(path)) // fresh table: maintenance before any commit
    val lock = logDir(path).resolve(".commit.lock")
    val deadline = System.currentTimeMillis() + lockWaitMs
    var held = false
    while (!held) {
      try { Files.createFile(lock); held = true }
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          val age = scala.util.Try(System.currentTimeMillis() -
            Files.getLastModifiedTime(lock).toMillis).getOrElse(0L)
          if (age > staleLockMs) { Files.deleteIfExists(lock); () }
          else if (System.currentTimeMillis() > deadline) sys.error(
            s"versioned table $path: commit lock $lock held for over " +
              s"${lockWaitMs / 1000}s — a concurrent writer is stuck " +
              "mid-commit or commit traffic needs backoff; if no writer " +
              "is alive, delete the lock file")
          else Thread.sleep(10)
      }
    }
    try body finally { Files.deleteIfExists(lock); () }
  }

  /** The shared commit protocol, all writer entry points route here so
    * the concurrency contract (class scaladoc) is enforced once:
    *
    *  1. stage the data dir (the Spark write — OUTSIDE the lock, full
    *     parallelism, lands in an immutable uniquely-named dir);
    *  2. fire `midCommitHook` (crash-injection seam — also outside the
    *     lock, so a two-writer test can commit from inside it);
    *  3. under the per-table `.commit.lock`: allocate `latest + 1`, run
    *     `conflictCheck(latest)` (throws → clean abort, the staged dir
    *     stays unreferenced), compute `carried(latest)` from the LATEST
    *     published manifest, stage the manifest file, publish with one
    *     ATOMIC_MOVE.
    *
    * Allocation + carried + publish under one lock is what linearizes
    * concurrent appends: a writer can no longer publish a manifest
    * computed against a snapshot another writer has since advanced
    * (the r13 protocol serialized version NUMBERS only and left that
    * lost-update window to a documented caller contract). */
  private def commitVersion(path: String, meta: Map[String, String],
      stage: String => Seq[String],
      carried: Option[Long] => Seq[String],
      midCommitHook: () => Unit = () => (),
      conflictCheck: Long => Unit = _ => ()): Unit = {
    Files.createDirectories(logDir(path))
    val dataDir = s"$path/data/c-${java.util.UUID.randomUUID().toString.take(12)}"
    val newFiles = stage(dataDir)
    midCommitHook()
    withCommitLock(path) {
      val latest = versions(path).lastOption.getOrElse(-1L)
      conflictCheck(latest)
      val next = latest + 1
      val carry = carried(if (latest < 0) None else Some(latest))
      def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
      val metaJson =
        if (meta.isEmpty) ""
        else meta.toSeq.sorted.map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
          .mkString(""", "meta": {""", ",", "}")
      val manifest = (carry ++ newFiles)
        .map(f => "\"" + esc(f) + "\"")
        .mkString("""{"version": """ + next + """, "files": [""", ",", "]" + metaJson + "}")
      val staged = Files.createTempFile(logDir(path), s".$next", ".staging")
      Files.writeString(staged, manifest)
      Files.move(staged, logDir(path).resolve(s"$next.json"), StandardCopyOption.ATOMIC_MOVE)
      ()
    }
  }
}
