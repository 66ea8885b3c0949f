package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{DataType, StringType, StructType}
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Reader for REAL Delta Lake tables — no delta-spark dependency.
  *
  * The Delta transaction log is a public, documented format (the Delta
  * Transaction Log Protocol): `_delta_log/%020d.json` commits of
  * newline-delimited actions (`protocol`, `metaData`, `add`, `remove`),
  * optionally compacted into `%020d.checkpoint.parquet` files referenced
  * by `_delta_log/_last_checkpoint`. A reader reconstructs a snapshot by
  * taking the newest checkpoint at-or-below the requested version and
  * replaying the JSON commits after it: live files = adds minus removes.
  * This module implements exactly that reconstruction, which closes the
  * S9 gap the offline build left (`VersionedParquet` reproduces delta
  * SEMANTICS for tables this engine writes, but could not open a table an
  * existing Delta deployment hands it).
  *
  * Supported: reader protocol 1 and 2 (without column mapping), simple
  * single-part checkpoints, time travel by version, partitioned tables
  * (partition columns rebuilt from `add.partitionValues` and cast to the
  * table schema's types — the SPEC's source of truth, so non-hive file
  * layouts read correctly too). Unsupported features fail LOUDLY, never
  * silently mis-read: column mapping, deletion vectors, reader protocol
  * ≥ 3 with unknown reader features, multi-part checkpoints.
  *
  * The write side lives in [[DeltaLogWriter]]: minimal protocol-correct
  * commits (protocol/metaData/add/remove, atomic `%020d.json` publish)
  * for unpartitioned append/overwrite — enough for a foreign Delta
  * reader to open what this engine writes; engine-internal stores stay
  * on [[VersionedParquet]]. */
object DeltaLogReader {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** A directory is a Delta table when its transaction log has at least
    * one commit or checkpoint. */
  def isDeltaTable(path: String): Boolean = {
    val log = Paths.get(path, "_delta_log")
    Files.isDirectory(log) && graft.util.Fs.list(log).exists { p =>
      val n = p.getFileName.toString
      n.matches("\\d{20}\\.json") || n.matches("\\d{20}\\.checkpoint\\.parquet")
    }
  }

  private[graft] final case class AddFile(path: String,
      partitionValues: Map[String, Option[String]], stats: Option[String] = None)
  private[graft] final case class State(
      var minReaderVersion: Int = 1,
      var readerFeatures: Set[String] = Set.empty,
      var schemaJson: Option[String] = None,
      var partitionColumns: Seq[String] = Nil,
      var configuration: Map[String, String] = Map.empty,
      files: scala.collection.mutable.LinkedHashMap[String, AddFile] =
        scala.collection.mutable.LinkedHashMap.empty)

  /** Replay the log to the requested (or latest) version; shared by
    * [[read]] and the writer's snapshot of live files. */
  private[graft] def loadState(spark: SparkSession, path: String,
      version: Option[Long]): (State, Long) = {
    val log = Paths.get(path, "_delta_log")
    val entries = graft.util.Fs.list(log).map(_.getFileName.toString)
    require(entries.exists(n => n.matches("\\d{20}\\.json") ||
      n.matches("\\d{20}\\.checkpoint\\.parquet")), s"no Delta log under $path")
    entries.filter(_.matches("\\d{20}\\.checkpoint\\.\\d{10}\\.\\d{10}\\.parquet"))
      .foreach(n => sys.error(s"multi-part Delta checkpoint $n not supported"))
    val commits = entries.filter(_.matches("\\d{20}\\.json"))
      .map(_.stripSuffix(".json").toLong).sorted
    val checkpoints = entries.filter(_.matches("\\d{20}\\.checkpoint\\.parquet"))
      .map(_.stripSuffix(".checkpoint.parquet").toLong).sorted
    val latest = (commits ++ checkpoints).max
    val target = version.getOrElse(latest)
    require(commits.contains(target) || checkpoints.contains(target),
      s"version $target not in Delta log (commits ${commits.headOption.getOrElse("-")}..$latest)")

    val state = new State()
    val cp = checkpoints.filter(_ <= target).lastOption
    cp.foreach(v => applyCheckpoint(spark, state,
      log.resolve(f"$v%020d.checkpoint.parquet").toString))
    commits.filter(v => v > cp.getOrElse(-1L) && v <= target).foreach { v =>
      Files.readAllLines(log.resolve(f"$v%020d.json")).asScala
        .filter(_.trim.nonEmpty).foreach(line => applyAction(state, mapper.readTree(line)))
    }
    guardProtocol(state, path)
    (state, target)
  }

  /** Snapshot read of a Delta table; `version = None` reads the latest
    * commit, `Some(v)` time-travels. */
  def read(spark: SparkSession, path: String, version: Option[Long] = None): DataFrame = {
    val (state, _) = loadState(spark, path, version)

    val schema = state.schemaJson
      .map(s => DataType.fromJson(s).asInstanceOf[StructType])
      .getOrElse(sys.error(s"Delta log under $path has no metaData action"))
    val adds = state.files.values.toSeq
    if (adds.isEmpty) return spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

    def resolve(p: String): String = {
      val decoded = java.net.URLDecoder.decode(p, "UTF-8")
      if (decoded.matches("^[a-zA-Z][a-zA-Z0-9+.-]*:/.*") || decoded.startsWith("/")) decoded
      else s"$path/$decoded"
    }
    if (state.partitionColumns.isEmpty)
      // the log's schemaString IS the table schema (spec): reading with it
      // pinned makes pre-evolution files null-fill later-added columns
      // instead of failing a parquet schema merge
      spark.read.schema(schema).parquet(adds.map(a => resolve(a.path)): _*)
    else {
      // partition columns are NOT in the data files: rebuild them from
      // add.partitionValues (the spec's source of truth — independent of
      // any hive-style directory layout) and cast to the schema's types
      val pTypes = state.partitionColumns.map(c =>
        c -> schema.fields.find(_.name == c).map(_.dataType).getOrElse(StringType))
      adds.groupBy(_.partitionValues).map { case (pv, group) =>
        pTypes.foldLeft(spark.read.parquet(group.map(a => resolve(a.path)): _*)) {
          case (df, (c, t)) =>
            df.withColumn(c, lit(pv.get(c).flatten.orNull).cast(t))
        }
      }.reduce(_ unionByName _).select(schema.fieldNames.map(col).toSeq: _*)
    }
  }

  /** Data-skipping snapshot read: prune files whose `add.stats` zone map
    * proves `colName BETWEEN lo AND hi` matches nothing, then read only
    * the survivors and apply the exact filter on top. Pruning is a
    * SUPERSET optimization — a file is only skipped when its [min, max]
    * misses the range entirely or it is provably all-NULL (BETWEEN never
    * matches NULL), so the result is byte-identical to filtering a full
    * [[read]]; files with no stats for the column are always kept.
    *
    * This is THE 100 TB scan economy for time-windowed queries over
    * date-clustered tables: the decision happens on driver-side log
    * metadata (one tiny JSON blob per file — ~100k files of metadata for
    * a 100 TB table), so non-overlapping files are never opened, never
    * footer-read, never scheduled. Comparisons run in the column's own
    * domain (numeric as BigDecimal; date/timestamp parsed from their
    * JDBC string forms; strings lexically — matching parquet/Delta
    * binary-stat ordering). Unpartitioned tables only, like the writer;
    * partitioned tables get directory-level pruning from
    * `add.partitionValues` via the ordinary [[read]] path. */
  def readPruned(spark: SparkSession, path: String, colName: String,
      lo: Any, hi: Any, version: Option[Long] = None): DataFrame = {
    val (state, _) = loadState(spark, path, version)
    require(state.partitionColumns.isEmpty,
      s"readPruned supports unpartitioned tables; $path is partitioned")
    val schema = state.schemaJson
      .map(s => DataType.fromJson(s).asInstanceOf[StructType])
      .getOrElse(sys.error(s"Delta log under $path has no metaData action"))
    val field = schema.fields.find(_.name == colName)
      .getOrElse(sys.error(s"column '$colName' not in table schema ${schema.simpleString}"))
    val (kept, _) = pruneByStats(state, field, lo, hi)
    def resolve(p: String): String = {
      val decoded = java.net.URLDecoder.decode(p, "UTF-8")
      if (decoded.matches("^[a-zA-Z][a-zA-Z0-9+.-]*:/.*") || decoded.startsWith("/")) decoded
      else s"$path/$decoded"
    }
    val base =
      if (kept.isEmpty) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema).parquet(kept.map(resolve): _*)
    base.filter(col(colName).between(
      lit(lo).cast(field.dataType), lit(hi).cast(field.dataType)))
  }

  /** The pruning decision alone — (kept, skipped) add-file paths — the
    * audit surface tests and operators use to ASSERT skipping happened. */
  private[graft] def pruneByStats(state: State,
      field: org.apache.spark.sql.types.StructField, lo: Any, hi: Any)
      : (Seq[String], Seq[String]) = {
    import org.apache.spark.sql.types._
    def key(v: Any): Option[AnyRef] = Option(v).map(x => field.dataType match {
      case _: NumericType => new java.math.BigDecimal(x.toString)
      case DateType => java.sql.Date.valueOf(x.toString)
      case TimestampType => java.sql.Timestamp.valueOf(x.toString)
      case _ => x.toString
    })
    def cmp(a: AnyRef, b: AnyRef): Int = (a, b) match {
      case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.compareTo(y)
      case (x: java.sql.Date, y: java.sql.Date) => x.compareTo(y)
      case (x: java.sql.Timestamp, y: java.sql.Timestamp) => x.compareTo(y)
      case (x: String, y: String) => x.compareTo(y)
      case _ => sys.error(s"incomparable stat values $a / $b")
    }
    val loK = key(lo).getOrElse(sys.error("lo bound must be non-null"))
    val hiK = key(hi).getOrElse(sys.error("hi bound must be non-null"))
    val (keep, skip) = state.files.values.toSeq.partition { a =>
      a.stats match {
        case None => true // no stats: must read
        case Some(s) =>
          val n = mapper.readTree(s)
          val minN = n.path("minValues").path(field.name)
          val maxN = n.path("maxValues").path(field.name)
          val nullCount = n.path("nullCount").path(field.name)
          val numRecords = n.path("numRecords")
          if (minN.isMissingNode || maxN.isMissingNode || minN.isNull || maxN.isNull)
            // min/max unknown: skip only a provably all-NULL file
            !(nullCount.isIntegralNumber && numRecords.isIntegralNumber &&
              nullCount.asLong() == numRecords.asLong())
          else {
            val minK = key(minN.asText()).get
            val maxK = key(maxN.asText()).get
            cmp(maxK, loK) >= 0 && cmp(minK, hiK) <= 0
          }
      }
    }
    (keep.map(_.path), skip.map(_.path))
  }

  private def applyCheckpoint(spark: SparkSession, state: State, file: String): Unit = {
    val cp = spark.read.parquet(file)
    val cols = cp.schema.fieldNames.toSet
    if (cols.contains("protocol"))
      cp.filter(col("protocol").isNotNull).select("protocol.*").collect()
        .foreach { r =>
          state.minReaderVersion = r.getAs[Any]("minReaderVersion") match {
            case null => 1; case i: Int => i; case l: Long => l.toInt
          }
          if (r.schema.fieldNames.contains("readerFeatures"))
            state.readerFeatures = Option(r.getAs[scala.collection.Seq[String]]("readerFeatures"))
              .map(_.toSet).getOrElse(Set.empty)
        }
    if (cols.contains("metaData")) {
      val md = cp.filter(col("metaData").isNotNull).select("metaData.*")
      md.collect().foreach { r =>
        state.schemaJson = Option(r.getAs[String]("schemaString"))
        state.partitionColumns =
          Option(r.getAs[scala.collection.Seq[String]]("partitionColumns"))
            .map(_.toSeq).getOrElse(Nil)
        if (r.schema.fieldNames.contains("configuration"))
          state.configuration = Option(r.getAs[Map[String, String]]("configuration"))
            .getOrElse(Map.empty)
      }
    }
    if (cols.contains("add")) {
      val addFields = cp.select("add.*").schema.fieldNames.toSet
      require(!addFields.contains("deletionVector") ||
        cp.filter(col("add.deletionVector").isNotNull).isEmpty,
        "Delta deletion vectors not supported")
      val statsCol =
        if (addFields.contains("stats")) col("add.stats")
        else lit(null).cast(StringType)
      cp.filter(col("add").isNotNull)
        .select(col("add.path"), col("add.partitionValues"), statsCol)
        .collect().foreach { r =>
          val pv = Option(r.getAs[Map[String, String]](1)).getOrElse(Map.empty)
          state.files(r.getString(0)) =
            AddFile(r.getString(0), pv.map { case (k, v) => k -> Option(v) },
              Option(r.getString(2)))
        }
    }
  }

  private def applyAction(state: State, node: com.fasterxml.jackson.databind.JsonNode): Unit = {
    if (node.has("protocol")) {
      val p = node.get("protocol")
      state.minReaderVersion = p.path("minReaderVersion").asInt(1)
      state.readerFeatures =
        if (p.has("readerFeatures"))
          p.get("readerFeatures").elements().asScala.map(_.asText()).toSet
        else Set.empty
    }
    if (node.has("metaData")) {
      val m = node.get("metaData")
      state.schemaJson = Option(m.path("schemaString").asText(null))
      state.partitionColumns =
        if (m.has("partitionColumns"))
          m.get("partitionColumns").elements().asScala.map(_.asText()).toSeq
        else Nil
      state.configuration =
        if (m.has("configuration"))
          m.get("configuration").properties().asScala
            .map(e => e.getKey -> e.getValue.asText()).toMap
        else Map.empty
    }
    if (node.has("add")) {
      val a = node.get("add")
      require(!a.has("deletionVector") || a.get("deletionVector").isNull,
        "Delta deletion vectors not supported")
      val p = a.get("path").asText()
      val pv =
        if (a.has("partitionValues"))
          a.get("partitionValues").properties().asScala
            .map(e => e.getKey ->
              (if (e.getValue.isNull) None else Some(e.getValue.asText()))).toMap
        else Map.empty[String, Option[String]]
      state.files(p) = AddFile(p, pv, Option(a.path("stats").asText(null)))
    }
    if (node.has("remove")) {
      state.files.remove(node.get("remove").get("path").asText()); ()
    }
  }

  /** Refuse, loudly, anything this reader cannot faithfully interpret. */
  private def guardProtocol(state: State, path: String): Unit = {
    val knownReaderFeatures = Set("timestampNtz") // spec features that need no reader work here
    if (state.minReaderVersion >= 3) {
      val unknown = state.readerFeatures -- knownReaderFeatures
      require(unknown.isEmpty,
        s"Delta table $path requires reader features ${unknown.mkString(", ")} — not supported")
    }
    require(state.minReaderVersion <= 3,
      s"Delta table $path requires reader protocol ${state.minReaderVersion} — not supported")
    val cm = state.configuration.getOrElse("delta.columnMapping.mode", "none")
    require(cm == "none" || cm == "",
      s"Delta table $path uses column mapping '$cm' — not supported")
  }

  /** Row-level diff between two snapshots of a keyed Delta table:
    * `(key…, change)` with change ∈ added | removed | changed — the
    * "what did this load actually do" audit, and the CDF substitute for
    * foreign tables whose writers don't emit a change feed. Keys are
    * assumed unique per snapshot (the upsert-table contract); non-key
    * columns are compared via a single hash over the columns COMMON to
    * both versions, so a schema-evolved table diffs on the shared
    * surface (new columns' values alone don't mark rows changed —
    * document/accept or project them explicitly).
    *
    * Shape: two snapshot scans reduced to (key, hash) immediately — the
    * full-outer join shuffles 8-byte hashes plus keys, never payload
    * columns. */
  def snapshotDiff(spark: SparkSession, path: String, fromVersion: Long,
      toVersion: Long, keyCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    require(keyCols.nonEmpty, "snapshotDiff needs at least one key column")
    val a = read(spark, path, Some(fromVersion))
    val b = read(spark, path, Some(toVersion))
    val common = a.columns.toSet.intersect(b.columns.toSet)
      .diff(keyCols.toSet).toSeq.sorted
    // to_json keeps null-vs-value distinctions unambiguous (a plain
    // multi-arg hash silently skips nulls, colliding ("a",null)/(null,"a"))
    def hashed(df: DataFrame, as: String) = df.select(
      keyCols.map(col) :+
        (if (common.isEmpty) lit(0L)
         else xxhash64(to_json(struct(common.map(col): _*)))).as(as): _*)
    // null-safe key join (the Scd2/Upsert key contract): a NULL key is a
    // value — an equi join would report it as a spurious added+removed
    // pair in every diff instead of matching it to itself
    val cond = keyCols.map(k => col(s"va.$k") <=> col(s"vb.$k")).reduce(_ && _)
    hashed(a, "__ha").alias("va")
      .join(hashed(b, "__hb").alias("vb"), cond, "full_outer")
      .withColumn("change",
        when(col("__ha").isNull, lit("added"))
          .when(col("__hb").isNull, lit("removed"))
          .when(col("__ha") =!= col("__hb"), lit("changed")))
      .filter(col("change").isNotNull)
      .select(keyCols.map(k => coalesce(col(s"va.$k"), col(s"vb.$k")).as(k)) :+
        col("change"): _*)
  }
}
