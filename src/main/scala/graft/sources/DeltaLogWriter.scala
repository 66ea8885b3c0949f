package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{DataType, StructType}
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Writer for REAL Delta Lake tables — the other half of
  * [[DeltaLogReader]], still with no delta-spark dependency.
  *
  * Each call is ONE commit of the public transaction-log protocol: data
  * files land under a per-commit subdirectory, then a
  * `_delta_log/%020d.json` of newline-delimited actions is published
  * atomically (temp file + ATOMIC_MOVE, with the same create-file lock
  * CAS [[VersionedParquet]] uses, so concurrent writers serialize onto
  * distinct versions instead of clobbering). The first commit carries
  * `protocol` (minReader 1 / minWriter 2 — no writer features, so any
  * spec-compliant reader opens the table) and `metaData`
  * (schemaString = Spark's StructType JSON, which IS the spec's schema
  * serialization); every commit carries one `add` per data file;
  * overwrite additionally emits a `remove` for every previously-live
  * file — time travel to pre-overwrite versions keeps working because
  * removed files are tombstoned, not deleted.
  *
  * Scope, on purpose: unpartitioned tables, append/overwrite,
  * single-part checkpoints every `checkpointInterval` commits (the
  * spec's log-compaction cadence — without it a year of daily commits
  * makes every reader replay hundreds of JSON files). Appends REQUIRE a
  * matching schema — loud failure, never silent schema drift; overwrite
  * may replace the schema and then re-emits `metaData` (the spec's
  * overwriteSchema shape).
  *
  * Per-file column stats (`add.stats`, the spec's optional JSON blob of
  * numRecords/minValues/maxValues/nullCount): pass `statsCols` and each
  * add action carries zone-map stats for those columns, which
  * [[DeltaLogReader.readPruned]] uses to SKIP whole files whose
  * [min,max] cannot satisfy a range predicate — the log-metadata
  * data-skipping that makes a 100 TB time-range query read only the
  * files that overlap the range instead of opening every footer. Stats
  * are collected by one grouped scan of the freshly written (hot)
  * files, grouping on `input_file_name()`; timestamps/dates serialize
  * via their JDBC string forms, which this pair parses back exactly. */
object DeltaLogWriter {

  def write(df: DataFrame, path: String, mode: String = "append",
      checkpointInterval: Int = 10, statsCols: Seq[String] = Nil,
      mergeSchema: Boolean = false): Long = {
    require(mode == "append" || mode == "overwrite",
      s"delta writer supports append|overwrite, got '$mode'")
    val spark = df.sparkSession
    val log = Paths.get(path, "_delta_log")
    Files.createDirectories(log)

    val prevLoaded =
      if (DeltaLogReader.isDeltaTable(path))
        Some(DeltaLogReader.loadState(spark, path, None))
      else None
    val prev = prevLoaded.map(_._1)
    val prevSchema = prev.flatMap(_.schemaJson)
      .map(s => DataType.fromJson(s).asInstanceOf[StructType])
    prev.foreach { s =>
      require(s.partitionColumns.isEmpty,
        s"delta writer does not support partitioned table $path")
      if (mode == "append" && !mergeSchema)
        require(prevSchema.contains(df.schema),
          s"append schema mismatch on $path: table has " +
            s"${prevSchema.map(_.simpleString).getOrElse("?")}, batch has ${df.schema.simpleString}")
    }
    // schema evolution (the spec's mergeSchema append): table columns keep
    // their position and MUST keep their exact type (widening would
    // silently re-type old files — loud failure instead); batch-only
    // columns append at the end. Old data files simply lack the new
    // columns; the reader null-fills them from the table schema.
    val mergedSchema: StructType =
      if (mode == "append" && mergeSchema && prevSchema.isDefined) {
        val old = prevSchema.get
        df.schema.fields.foreach { f =>
          old.fields.find(_.name == f.name).foreach { o =>
            require(o.dataType == f.dataType,
              s"mergeSchema cannot change column '${f.name}' from " +
                s"${o.dataType.simpleString} to ${f.dataType.simpleString} on $path")
            require(o.nullable || !f.nullable,
              s"mergeSchema cannot write nullable data into non-null " +
                s"column '${f.name}' on $path")
          }
        }
        // appended columns are nullable by construction: every
        // pre-evolution file null-fills them
        StructType(old.fields ++ df.schema.fields
          .filterNot(f => old.fieldNames.contains(f.name))
          .map(_.copy(nullable = true)))
      } else df.schema

    // data files: one fresh subdirectory per commit, so `add` paths are
    // unique forever and no file is ever rewritten in place
    statsCols.foreach(c => require(df.schema.fieldNames.contains(c),
      s"statsCols column '$c' not in batch schema ${df.schema.simpleString}"))
    val sub = "part-" + java.util.UUID.randomUUID().toString.take(8)
    df.write.mode("errorifexists").parquet(s"$path/$sub")
    val dataFiles = graft.util.Fs.list(Paths.get(path, sub))
      .filter(_.getFileName.toString.endsWith(".parquet"))

    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def obj() = mapper.createObjectNode()
    val statsByName: Map[String, String] =
      if (statsCols.isEmpty) Map.empty
      else {
        import org.apache.spark.sql.functions.{col, count, input_file_name, lit, max, min, when}
        val aggs = count(lit(1)).as("__n") +: statsCols.flatMap(c => Seq(
          min(col(c)), max(col(c)), count(when(col(c).isNull, 1))))
        // one grouped pass over the just-written files; column pruning
        // keeps the scan to statsCols only
        val grouped = spark.read.parquet(s"$path/$sub")
          .groupBy(input_file_name().as("__f"))
          .agg(aggs.head, aggs.tail: _*)
          .collect()
        grouped.map { r =>
          val fname = java.net.URLDecoder
            .decode(r.getString(0).split("/").last, "UTF-8")
          val root = obj()
          root.put("numRecords", r.getLong(1))
          val mins = root.putObject("minValues")
          val maxs = root.putObject("maxValues")
          val nulls = root.putObject("nullCount")
          statsCols.zipWithIndex.foreach { case (c, i) =>
            def putVal(n: com.fasterxml.jackson.databind.node.ObjectNode, v: Any): Unit =
              v match {
                case null => ()
                case x: Int => n.put(c, x)
                case x: Long => n.put(c, x)
                case x: Short => n.put(c, x.toInt)
                case x: Byte => n.put(c, x.toInt)
                case x: Double => n.put(c, x)
                case x: Float => n.put(c, x.toDouble)
                case x: java.math.BigDecimal => n.put(c, x)
                case x: Boolean => n.put(c, x)
                case x => n.put(c, x.toString)
              }
            putVal(mins, r.get(2 + 3 * i))
            putVal(maxs, r.get(3 + 3 * i))
            nulls.put(c, r.getLong(4 + 3 * i))
          }
          fname -> mapper.writeValueAsString(root)
        }.toMap
      }
    val now = System.currentTimeMillis()
    val actions = collection.mutable.ArrayBuffer[String]()
    val firstCommit = prev.isEmpty
    val schemaChanged = prevSchema.exists(_ != mergedSchema)
    if (firstCommit) {
      val p = obj(); val pp = p.putObject("protocol")
      pp.put("minReaderVersion", 1); pp.put("minWriterVersion", 2)
      actions += mapper.writeValueAsString(p)
    }
    if (firstCommit || schemaChanged) {
      val m = obj(); val md = m.putObject("metaData")
      md.put("id", java.util.UUID.randomUUID().toString)
      val fmt = md.putObject("format")
      fmt.put("provider", "parquet"); fmt.putObject("options")
      md.put("schemaString", mergedSchema.json)
      md.putArray("partitionColumns")
      md.putObject("configuration")
      md.put("createdTime", now)
      actions += mapper.writeValueAsString(m)
    }
    if (mode == "overwrite") prev.foreach(_.files.keys.foreach { f =>
      val r = obj(); val rm = r.putObject("remove")
      rm.put("path", f); rm.put("deletionTimestamp", now); rm.put("dataChange", true)
      actions += mapper.writeValueAsString(r)
    })
    dataFiles.foreach { f =>
      val a = obj(); val ad = a.putObject("add")
      ad.put("path", s"$sub/${f.getFileName}")
      ad.putObject("partitionValues")
      ad.put("size", Files.size(f))
      ad.put("modificationTime", now)
      ad.put("dataChange", true)
      // spec shape: stats is a JSON-encoded STRING field, not a nested node
      statsByName.get(f.getFileName.toString).foreach(s => ad.put("stats", s))
      actions += mapper.writeValueAsString(a)
    }

    // commit: CAS a lock for the next free version, publish atomically
    var next = prevLoaded.map(_._2 + 1).getOrElse(0L)
    var lock: java.nio.file.Path = null
    while (lock == null) {
      if (Files.exists(log.resolve(f"$next%020d.json"))) next += 1
      else {
        val cand = log.resolve(f"$next%020d.lock")
        try { Files.createFile(cand); lock = cand }
        catch { case _: java.nio.file.FileAlreadyExistsException => next += 1 }
      }
    }
    try {
      val staged = Files.createTempFile(log, f".$next%020d", ".staging")
      Files.writeString(staged, actions.mkString("", "\n", "\n"))
      Files.move(staged, log.resolve(f"$next%020d.json"), StandardCopyOption.ATOMIC_MOVE)
    } finally { Files.deleteIfExists(lock); () }
    // log lifecycle: every `checkpointInterval` commits, compact the
    // replay state into a checkpoint so readers stop paying O(commits)
    if (checkpointInterval > 0 && (next + 1) % checkpointInterval == 0)
      checkpoint(spark, path)
    next
  }

  /** Write a single-part checkpoint of the CURRENT snapshot at the latest
    * version — the spec's log-compaction primitive: one parquet of
    * `protocol` / `metaData` / `add` action rows, after which a reader
    * needs only the commits PAST the checkpoint (the reader side of this
    * pair already prefers the newest checkpoint at-or-below its target).
    * Commits are never deleted here — time travel to any version keeps
    * working; history retention is a separate policy decision. */
  def checkpoint(spark: org.apache.spark.sql.SparkSession, path: String): Long = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val (state, version) = DeltaLogReader.loadState(spark, path, None)
    val schemaJson = state.schemaJson.getOrElse(
      sys.error(s"cannot checkpoint $path: no metaData in log"))
    val protocolT = StructType(Seq(
      StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType)))
    val formatT = StructType(Seq(
      StructField("provider", StringType),
      StructField("options", MapType(StringType, StringType))))
    val metaT = StructType(Seq(
      StructField("id", StringType),
      StructField("format", formatT),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("configuration", MapType(StringType, StringType)),
      StructField("createdTime", LongType)))
    val addT = StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("dataChange", BooleanType),
      StructField("stats", StringType)))
    val cpT = StructType(Seq(
      StructField("protocol", protocolT),
      StructField("metaData", metaT),
      StructField("add", addT)))
    val rows =
      Row(Row(state.minReaderVersion, 2), null, null) +:
      Row(null, Row(java.util.UUID.randomUUID().toString,
        Row("parquet", Map.empty[String, String]), schemaJson,
        state.partitionColumns, state.configuration,
        System.currentTimeMillis()), null) +:
      state.files.values.toSeq.map(a =>
        Row(null, null, Row(a.path,
          a.partitionValues.map { case (k, v) => k -> v.orNull }, true,
          a.stats.orNull)))
    val log = Paths.get(path, "_delta_log")
    val tmp = Files.createTempDirectory(log, ".cp").toString
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), cpT)
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = graft.util.Fs.list(Paths.get(tmp))
      .find(_.getFileName.toString.endsWith(".parquet"))
      .getOrElse(sys.error("checkpoint write produced no parquet"))
    Files.move(part, log.resolve(f"$version%020d.checkpoint.parquet"),
      StandardCopyOption.ATOMIC_MOVE)
    graft.util.Fs.walk(Paths.get(tmp)).reverse.foreach(Files.deleteIfExists(_))
    val lc = Files.createTempFile(log, "._last_checkpoint", ".staging")
    Files.writeString(lc, s"""{"version":$version,"size":${rows.size}}""")
    Files.move(lc, log.resolve("_last_checkpoint"),
      StandardCopyOption.REPLACE_EXISTING)
    version
  }

  /** VACUUM: delete data files referenced by NO snapshot within the last
    * `keepVersions` commits — the spec's storage-reclamation semantics.
    * The log itself is untouched, so the table's history metadata stays
    * inspectable, but time travel to a vacuumed version fails LOUDLY at
    * scan time on the missing file (the [[VersionedParquet.vacuum]]
    * contract — never a silently partial snapshot). Returns the deleted
    * file names.
    *
    * Listing replays each retained version's log state (log-scale work,
    * no data scan); deletion compares the directory listing against the
    * retained file union. */
  def vacuum(spark: org.apache.spark.sql.SparkSession, path: String,
      keepVersions: Int): Seq[String] = {
    require(keepVersions >= 1, s"keepVersions must be >= 1, got $keepVersions")
    val (_, latest) = DeltaLogReader.loadState(spark, path, None)
    val horizon = math.max(0L, latest - keepVersions + 1)
    val retained = (horizon to latest).flatMap { v =>
      DeltaLogReader.loadState(spark, path, Some(v))._1.files.keys
    }.map(p => java.net.URLDecoder.decode(p, "UTF-8")).toSet
    val dir = java.nio.file.Paths.get(path)
    import scala.jdk.CollectionConverters._
    // add.path entries are table-relative (the writer stages each commit
    // in its own subdirectory) — walk recursively and compare relative
    // paths, skipping the transaction log itself
    val walked = java.nio.file.Files.walk(dir).iterator().asScala
      .filter(p => java.nio.file.Files.isRegularFile(p))
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .map(p => (p, dir.relativize(p).toString))
      .filterNot { case (_, rel) => rel.startsWith("_delta_log") }
      .filterNot { case (_, rel) => retained.contains(rel) }
      .toList
    walked.foreach { case (p, _) => java.nio.file.Files.delete(p) }
    walked.map(_._2)
  }
}
