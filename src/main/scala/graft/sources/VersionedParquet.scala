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
  */
object VersionedParquet {

  private def logDir(path: String) = Paths.get(path, "_graft_log")

  /** Committed versions, ascending. */
  def versions(path: String): Seq[Long] =
    if (!Files.exists(logDir(path))) Nil
    else Files.list(logDir(path)).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toLong).toSeq.sorted

  private def manifestFiles(path: String, version: Long): Seq[String] = {
    val txt = new String(Files.readAllBytes(logDir(path).resolve(s"$version.json")), "UTF-8")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(txt)
    node.get("files").elements().asScala.map(_.asText()).toSeq
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

  /** Commit `df` with `mode` "append" | "overwrite". */
  def write(df: DataFrame, path: String, mode: String): Unit = {
    val next = versions(path).lastOption.getOrElse(-1L) + 1
    val dataDir = s"$path/data/v$next-${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.mode("errorifexists").parquet(dataDir)
    val newFiles = Files.list(Paths.get(dataDir)).iterator().asScala
      .map(_.toString).filter(f => f.endsWith(".parquet")).toSeq
    val carried = mode.toLowerCase match {
      case "append"    => versions(path).lastOption.map(manifestFiles(path, _)).getOrElse(Nil)
      case "overwrite" => Nil
      case m           => sys.error(s"versioned table supports append|overwrite, got '$m'")
    }
    val manifest = (carried ++ newFiles)
      .map(f => "\"" + f.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .mkString("""{"version": """ + next + """, "files": [""", ",", "]}")
    Files.createDirectories(logDir(path))
    val staged = Files.createTempFile(logDir(path), s".$next", ".staging")
    Files.writeString(staged, manifest)
    Files.move(staged, logDir(path).resolve(s"$next.json"), StandardCopyOption.ATOMIC_MOVE)
  }
}
