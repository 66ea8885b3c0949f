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
  *   <path>/data/v<version>-<uuid>/     — immutable data dirs per commit
  *
  * A reader lists the log, picks the requested (default: latest) version,
  * and reads exactly that manifest's files — writers never mutate existing
  * data dirs, so concurrent readers see a consistent snapshot. Commit
  * atomicity: the manifest is staged and atomically moved into the log,
  * so a crashed write leaves only unreferenced data (same recovery model
  * as a real table format's uncommitted files).
  *
  * Concurrency: readers always safe; version NUMBERS are serialized by
  * the per-version `.lock` create (atomic check-and-create, see
  * [[write]]), so two concurrent writers allocate distinct versions —
  * but SEMANTIC serialization is still the caller's job: two concurrent
  * appends each carry the file list they READ, so the later commit wins
  * and the earlier one's rows survive only if the later writer read
  * them first. One mutator at a time per table. Full rules: PLANS.md
  * "Store concurrency contracts".
  */
object VersionedParquet {

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

  /** Commit `df` with `mode` "append" | "overwrite".
    *
    * Concurrency: the version number is CLAIMED up front via an atomic
    * `createFile(<v>.lock)` — two writers racing on the same next version
    * can no longer both stage `<v>.json` and have the second ATOMIC_MOVE
    * silently replace the first's committed manifest (ADVICE r1); the loser
    * of the claim advances to the next number and retries, mirroring
    * delta's optimistic-concurrency version allocation. A crashed claimant
    * leaves a harmless version gap (readers key off `.json` files only).
    * Caveat (documented, same single-scheduler assumption as the P3 run
    * guard): with concurrent APPENDs the carried-file set is read from
    * committed versions below ours at commit time, so true cross-append
    * linearization still wants one writer per table. */
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
  def compact(spark: SparkSession, path: String, targetFiles: Int = 1): Unit = {
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
    write(read(spark, path).repartition(targetFiles), path, "overwrite",
      commitMeta(path, vs.max))
  }

  /** Drop history: delete manifests older than the last `keepVersions`
    * commits and every data file no surviving manifest references. The
    * storage-reclamation sibling of [[compact]] — after it, time travel
    * reaches only the kept versions. Runs driver-side (file listing +
    * deletes); at object-store scale the same walk batches into bulk
    * deletes. Returns the number of data files removed. */
  def vacuum(path: String, keepVersions: Int = 1): Int = {
    require(keepVersions >= 1, "must keep at least the latest version")
    val vs = versions(path)
    val (dropped, kept) = vs.splitAt((vs.size - keepVersions).max(0))
    val live = kept.flatMap(manifestFiles(path, _)).toSet
    val dead = dropped.flatMap(manifestFiles(path, _)).toSet -- live
    dead.foreach(f => Files.deleteIfExists(Paths.get(f)))
    dropped.foreach(v => Files.deleteIfExists(logDir(path).resolve(s"$v.json")))
    dead.size
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

  /** Full-overwrite commit in the partition-scoped layout — the
    * initialization sibling of [[overwritePartitions]] (every later
    * partial commit requires the table's files to carry the partition
    * path segment this writes). `partitionCol` values must be
    * directory-safe (ints or simple strings). */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit = {
    import org.apache.spark.sql.functions.col
    commitVersion(path, Map.empty,
      stage = dataDir => stagePartitioned(df, partitionCol, dataDir),
      carried = _ => Nil)
  }

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
    * manifest publish. */
  def overwritePartitions(df: DataFrame, path: String, partitionCol: String,
      touched: Seq[String], midCommitHook: () => Unit = () => ()): Unit = {
    import org.apache.spark.sql.functions.col
    require(touched.nonEmpty, "overwritePartitions needs at least one touched partition")
    commitVersion(path, Map.empty,
      stage = dataDir => {
        val files = stagePartitioned(df, partitionCol, dataDir)
        // rows OUTSIDE the touched set would publish beside the carried
        // old files of their partitions — silent duplication. Checked
        // from the staged directory names (driver-side, pre-publish:
        // nothing is committed yet, so failing here is a clean abort).
        val stagedParts = files.flatMap { f =>
          val i = f.indexOf(s"/$PartDir=")
          if (i < 0) None
          else Some(f.substring(i + PartDir.length + 2).takeWhile(_ != '/'))
        }.distinct
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
      midCommitHook = midCommitHook)
  }

  /** Snapshot read of ONLY the partitions holding `touched` values —
    * manifest-level pruning: non-touched partitions' files are filtered
    * from the file list driver-side, never opened. Empty result (schema
    * from the full snapshot) when no touched partition exists yet. */
  def readPartitions(spark: SparkSession, path: String, touched: Seq[String],
      version: Option[Long] = None): DataFrame = {
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

  /** The shared commit protocol: claim a version number via the atomic
    * `.lock` create, stage the data dir, build the manifest from
    * `carried(prevVersion) ++ staged files`, publish with one atomic
    * rename. All writer entry points route here so the concurrency
    * contract (scaladoc on [[write]]) is enforced once. */
  private def commitVersion(path: String, meta: Map[String, String],
      stage: String => Seq[String],
      carried: Option[Long] => Seq[String],
      midCommitHook: () => Unit = () => ()): Unit = {
    Files.createDirectories(logDir(path))
    var next = versions(path).lastOption.getOrElse(-1L) + 1
    var lock: java.nio.file.Path = null
    while (lock == null) {
      val cand = logDir(path).resolve(s"$next.lock")
      if (Files.exists(logDir(path).resolve(s"$next.json"))) next += 1
      else
        try { Files.createFile(cand); lock = cand }
        catch { case _: java.nio.file.FileAlreadyExistsException => next += 1 }
    }
    try {
      val dataDir = s"$path/data/v$next-${java.util.UUID.randomUUID().toString.take(8)}"
      val newFiles = stage(dataDir)
      val carry = carried(versions(path).filter(_ < next).lastOption)
      def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
      val metaJson =
        if (meta.isEmpty) ""
        else meta.toSeq.sorted.map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
          .mkString(""", "meta": {""", ",", "}")
      val manifest = (carry ++ newFiles)
        .map(f => "\"" + esc(f) + "\"")
        .mkString("""{"version": """ + next + """, "files": [""", ",", "]" + metaJson + "}")
      midCommitHook()
      val staged = Files.createTempFile(logDir(path), s".$next", ".staging")
      Files.writeString(staged, manifest)
      Files.move(staged, logDir(path).resolve(s"$next.json"), StandardCopyOption.ATOMIC_MOVE)
    } finally { Files.deleteIfExists(lock); () }
  }
}
