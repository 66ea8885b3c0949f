package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.config.{ColumnMapping, InputSpec}

/** Phase-1 input binding: read each configured input and register it as a
  * named temp view (reference: /root/reference/spark.json:14-23,32-38 — the
  * `dataFrameName` is "the temporary view name", spark.json:16).
  *
  * Format surface (spark.json:19): csv, parquet, orc, json, xml, text.
  * Excel / Delta / SFTP are declared by the reference but need external
  * packages unavailable in this offline build; they are isolated behind
  * [[RemoteFs]]-style hooks (SURVEY.md §7.4) and report a clear error.
  *
  * Scale notes: all readers are plain `spark.read` — Catalyst handles
  * split sizing via spark.sql.files.maxPartitionBytes (the reference pins
  * 128 MiB, spark.json:5), column pruning, and parquet/orc predicate
  * pushdown. Nothing here forces an action or a driver-side collect.
  */
object SourceReader {

  /** Transport used by the `sftp` source (S11): swap in a real [[SftpFs]]
    * in deployment; defaults to local staging (which is also how tests
    * exercise the flow end-to-end). */
  @volatile var remoteFs: RemoteFs = new LocalStagingFs

  def read(spark: SparkSession, in: InputSpec): DataFrame = {
    val base = in.format match {
      case "parquet" => spark.read.options(in.options).parquet(in.path.get)
      case "orc"     => spark.read.options(in.options).orc(in.path.get)
      case "csv" =>
        spark.read
          .option("header", in.header.toString)
          .option("inferSchema", in.options.getOrElse("inferSchema", "true"))
          .options(in.options)
          .csv(in.path.get)
      case "json" => spark.read.options(in.options).json(in.path.get)
      case "text" => spark.read.options(in.options).text(in.path.get)
      case "xml" => // Spark 4 ships native XML (formerly spark-xml)
        spark.read.format("xml").options(in.options).load(in.path.get)
      case "jdbc" =>
        val r = spark.read.format("jdbc").option("url", in.jdbcUrl.getOrElse(""))
        val withTarget = (in.tableQuery, in.tableName) match {
          case (Some(q), _)    => r.option("query", q)
          case (_, Some(t))    => r.option("dbtable", t)
          case _               => sys.error(s"jdbc input ${in.dataFrameName} needs tableName or tableQuery")
        }
        withTarget.options(in.options).load()
      case "sql" => // additional-input SQL over already-registered views (spark.json:36-38)
        spark.sql(in.sql.getOrElse(sys.error(s"sql input ${in.dataFrameName} needs sql")))
      case "deltalake" | "delta" => // S9: real Delta log reader, or the versioned-parquet twin
        // A REAL Delta table (written by an existing deployment) is
        // detected by its _delta_log and read through the dependency-free
        // protocol reader; tables this engine writes use VersionedParquet
        // (same user-facing semantics: snapshots, time travel, CDF).
        if (DeltaLogReader.isDeltaTable(in.path.get)) {
          require(in.options.get("changesSince").isEmpty,
            "change-feed reads of foreign Delta tables are not supported " +
              "(CDF requires _change_data files this reader does not interpret); " +
              "read snapshots via versionAsOf instead")
          DeltaLogReader.read(spark, in.path.get,
            in.options.get("versionAsOf").map(_.toLong))
        } else in.options.get("changesSince") match {
          // incremental consumption: changesSince=<v> binds the CDF rows
          // committed after version v (insert/delete + _commit_version)
          // instead of a snapshot — the input an incremental pipeline step
          // declares to avoid re-reading the accumulated table
          case Some(v) => VersionedParquet.readChanges(spark, in.path.get, v.toLong,
            in.options.get("changesUntil").map(_.toLong))
          case None => VersionedParquet.read(spark, in.path.get,
            in.options.get("versionAsOf").map(_.toLong))
        }
      case "excel" | "xlsx" => // S7: minimal built-in xlsx reader (offline build)
        ExcelSource.read(spark, in.path.get,
          header = in.header || in.options.get("header").contains("true"))
      case "sftp" => // S11: pull to staging via RemoteFs, then read as the staged format
        val staging = java.nio.file.Files.createTempDirectory("graft-sftp-in").toString
        val local = remoteFs.download(in.path.get, staging)
        val stagedFormat = in.options.getOrElse("stagedFormat", "csv")
        read(spark, in.copy(format = stagedFormat, path = Some(local),
          options = in.options - "stagedFormat"))
      case other =>
        sys.error(s"unknown source format '$other'")
    }
    val mapped = in.metadataPath.map(p => applyMetadataMapping(base, loadMapping(p))).getOrElse(base)
    val projected =
      if (in.selectColumns.nonEmpty) mapped.select(in.selectColumns.map(col): _*) else mapped
    projected.createOrReplaceTempView(in.dataFrameName)
    projected
  }

  /** Metadata-driven schema-on-read (spark.json:21-22): JSON list of
    * {sourceColumn, targetColumn, dataType}, applied as a single projection
    * so Catalyst still prunes/pushes down beneath it. */
  def applyMetadataMapping(df: DataFrame, mapping: Seq[ColumnMapping]): DataFrame =
    df.select(mapping.map(m => col(m.sourceColumn).cast(m.dataType).as(m.targetColumn)): _*)

  def loadMapping(path: String): Seq[ColumnMapping] = {
    val txt = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val list = mapper.readValue(txt, classOf[java.util.List[java.util.Map[String, String]]])
    import scala.jdk.CollectionConverters._
    list.asScala.toSeq.map(m =>
      ColumnMapping(m.get("sourceColumn"), m.get("targetColumn"), m.get("dataType")))
  }

  /** Junk-character removal (spark.json:27): strip control / non-printable
    * chars from every string column. Pure built-in `regexp_replace`, so it
    * stays inside whole-stage codegen. */
  def stripJunkCharacters(df: DataFrame): DataFrame = {
    val cleaned = df.schema.fields.map { f =>
      if (f.dataType == org.apache.spark.sql.types.StringType)
        regexp_replace(col(f.name), "[^\\x20-\\x7E\\t\\n\\r]", "").as(f.name)
      else col(f.name)
    }
    df.select(cleaned.toSeq: _*)
  }

  /** Schema-adaptive read of the `events` fixture: the driver has shipped
    * `ts` as parquet TIMESTAMP(NANOS) in some builds and TIMESTAMP(MICROS)
    * (isAdjustedToUTC=false → Spark TIMESTAMP_NTZ) in others. Normalize to
    * session-TZ TimestampType (sessions here pin UTC, matching the DuckDB
    * oracle's naive-timestamp read) by inspecting the column's ACTUAL type
    * instead of hard-coding one encoding:
    *   - LongType (nanosAsLong fallback for NANOS files) → truncate to
    *     micros, exactly DuckDB's nanos→TIMESTAMP conversion;
    *   - TimestampNTZType (current MICROS fixtures) → cast; under a UTC
    *     session this relabels the same micros value, no instant shift;
    *   - TimestampType → pass through.
    * Single seam for SparkEntry.reg, the streaming specs and ScaleProbe —
    * round 5 failed precisely because this adaptation was copy-pasted. */
  def readEvents(spark: SparkSession, path: String): DataFrame = {
    // harmless for micros files; required before reading NANOS files
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(path)
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
}
