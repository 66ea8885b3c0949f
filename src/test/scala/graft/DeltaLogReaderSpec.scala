package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import graft.sources.DeltaLogReader
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Reads REAL Delta Lake transaction logs (hand-authored here — the log
  * IS the public protocol, so a log this spec writes is exactly what an
  * existing Delta deployment produces for these actions): snapshot
  * reconstruction, remove actions, time travel, checkpoint + tail
  * replay, partition rebuild from partitionValues, and the loud guards
  * for features the reader cannot faithfully interpret. */
class DeltaLogReaderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Write `df` as ONE parquet file at tableDir/relPath, return relPath. */
  private def dataFile(df: org.apache.spark.sql.DataFrame, tableDir: String,
      relPath: String): String = {
    val tmp = Files.createTempDirectory("delta_part").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = graft.util.Fs.list(Paths.get(tmp))
      .find(_.getFileName.toString.endsWith(".parquet")).get
    val target = Paths.get(tableDir, relPath)
    Files.createDirectories(target.getParent)
    Files.move(part, target, StandardCopyOption.REPLACE_EXISTING)
    relPath
  }

  private def commit(tableDir: String, v: Long, lines: Seq[String]): Unit = {
    val log = Paths.get(tableDir, "_delta_log")
    Files.createDirectories(log)
    Files.writeString(log.resolve(f"$v%020d.json"), lines.mkString("\n") + "\n")
    ()
  }

  private def protoLine(reader: Int = 1, features: Seq[String] = Nil) =
    if (features.isEmpty)
      s"""{"protocol":{"minReaderVersion":$reader,"minWriterVersion":2}}"""
    else s"""{"protocol":{"minReaderVersion":$reader,"minWriterVersion":7,""" +
      s""""readerFeatures":[${features.map("\"" + _ + "\"").mkString(",")}],"writerFeatures":[]}}"""

  private def metaLine(schema: StructType, partCols: Seq[String] = Nil,
      conf: Map[String, String] = Map.empty) = {
    val pc = partCols.map("\"" + _ + "\"").mkString("[", ",", "]")
    val cf = conf.map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
    s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${new com.fasterxml.jackson.databind.ObjectMapper().writeValueAsString(schema.json)},""" +
      s""""partitionColumns":$pc,"configuration":$cf,"createdTime":0}}"""
  }

  private def addLine(path: String, pv: Map[String, String] = Map.empty) = {
    val m = pv.map { case (k, v) =>
      s""""$k":${if (v == null) "null" else "\"" + v + "\""}""" }.mkString("{", ",", "}")
    s"""{"add":{"path":"$path","partitionValues":$m,"size":1,"modificationTime":0,"dataChange":true}}"""
  }

  private def removeLine(path: String) =
    s"""{"remove":{"path":"$path","deletionTimestamp":0,"dataChange":true}}"""

  private val idv = new StructType().add("id", LongType).add("v", StringType)

  test("snapshot reconstruction: adds, removes, time travel by version") {
    val t = Files.createTempDirectory("delta_basic").toString
    val f0 = dataFile(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t, "f0.parquet")
    val f1 = dataFile(Seq((3L, "c")).toDF("id", "v"), t, "f1.parquet")
    val f2 = dataFile(Seq((10L, "x"), (20L, "y")).toDF("id", "v"), t, "f2.parquet")
    commit(t, 0, Seq(protoLine(), metaLine(idv), addLine(f0)))
    commit(t, 1, Seq(addLine(f1)))
    commit(t, 2, Seq(removeLine(f0), removeLine(f1), addLine(f2))) // overwrite
    assert(DeltaLogReader.isDeltaTable(t))
    def ids(version: Option[Long]) = DeltaLogReader.read(spark, t, version)
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids(None) == Seq(10L, 20L))
    assert(ids(Some(0L)) == Seq(1L, 2L))
    assert(ids(Some(1L)) == Seq(1L, 2L, 3L))
    intercept[IllegalArgumentException] { DeltaLogReader.read(spark, t, Some(9L)) }
    // and the config-driven source routes a real Delta table here
    val viaSource = graft.sources.SourceReader.read(spark,
      graft.config.InputSpec("d", "deltalake", path = Some(t)))
    assert(viaSource.select("id").as[Long].collect().sorted.toSeq == Seq(10L, 20L))
    val cdf = intercept[IllegalArgumentException] {
      graft.sources.SourceReader.read(spark, graft.config.InputSpec("d", "deltalake",
        path = Some(t), options = Map("changesSince" -> "0")))
    }
    assert(cdf.getMessage.contains("not supported"))
  }

  test("partition columns rebuild from partitionValues, not directory names") {
    val t = Files.createTempDirectory("delta_part").toString
    val schema = new StructType().add("id", LongType)
      .add("lang", StringType).add("n", IntegerType)
    // data files carry ONLY id; paths are deliberately non-hive
    val fEn = dataFile(Seq(1L, 2L).toDF("id"), t, "data/blob-aa.parquet")
    val fFr = dataFile(Seq(3L).toDF("id"), t, "data/blob-bb.parquet")
    val fNull = dataFile(Seq(9L).toDF("id"), t, "data/blob-cc.parquet")
    commit(t, 0, Seq(protoLine(), metaLine(schema, Seq("lang", "n")),
      addLine(fEn, Map("lang" -> "en", "n" -> "1")),
      addLine(fFr, Map("lang" -> "fr", "n" -> "2")),
      addLine(fNull, Map("lang" -> null, "n" -> "3"))))
    val out = DeltaLogReader.read(spark, t)
    assert(out.schema.fieldNames.toSeq == Seq("id", "lang", "n"))
    assert(out.schema("n").dataType == IntegerType)
    val rows = out.collect().map(r => (r.getLong(0),
      Option(r.get(1)).map(_.toString).orNull, r.getInt(2))).toSet
    assert(rows == Set((1L, "en", 1), (2L, "en", 1), (3L, "fr", 2), (9L, null, 3)))
  }

  test("checkpoint base + commit tail replay (expired JSON history)") {
    val t = Files.createTempDirectory("delta_cp").toString
    val f0 = dataFile(Seq((1L, "a")).toDF("id", "v"), t, "f0.parquet")
    val f1 = dataFile(Seq((2L, "b")).toDF("id", "v"), t, "f1.parquet")
    val f2 = dataFile(Seq((3L, "c")).toDF("id", "v"), t, "f2.parquet")
    // checkpoint at version 1 holds protocol + metaData + the live adds
    val addT = new StructType().add("path", StringType)
      .add("partitionValues", MapType(StringType, StringType))
      .add("size", LongType).add("modificationTime", LongType)
      .add("dataChange", BooleanType)
    val metaT = new StructType().add("id", StringType)
      .add("schemaString", StringType)
      .add("partitionColumns", ArrayType(StringType))
      .add("configuration", MapType(StringType, StringType))
    val protoT = new StructType().add("minReaderVersion", IntegerType)
      .add("minWriterVersion", IntegerType)
    val cpSchema = new StructType().add("add", addT).add("metaData", metaT)
      .add("protocol", protoT)
    val rows = java.util.Arrays.asList(
      Row(Row(f0, Map.empty[String, String], 1L, 0L, true), null, null),
      Row(Row(f1, Map.empty[String, String], 1L, 0L, true), null, null),
      Row(null, Row("t", idv.json, Seq.empty[String], Map.empty[String, String]), null),
      Row(null, null, Row(1, 2)))
    val tmp = Files.createTempDirectory("delta_cp_file").toString
    spark.createDataFrame(rows, cpSchema).coalesce(1)
      .write.mode("overwrite").parquet(tmp)
    val part = graft.util.Fs.list(Paths.get(tmp))
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.createDirectories(Paths.get(t, "_delta_log"))
    Files.move(part, Paths.get(t, "_delta_log", f"${1L}%020d.checkpoint.parquet"))
    // JSON history before/at the checkpoint is vacuumed away; only the tail
    commit(t, 2, Seq(addLine(f2)))
    val ids = DeltaLogReader.read(spark, t)
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L))
    // time travel to the checkpoint version itself also works
    assert(DeltaLogReader.read(spark, t, Some(1L))
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("unsupported features fail loudly, never silently mis-read") {
    val t = Files.createTempDirectory("delta_guard").toString
    val f0 = dataFile(Seq((1L, "a")).toDF("id", "v"), t, "f0.parquet")
    commit(t, 0, Seq(protoLine(reader = 3, features = Seq("deletionVectors")),
      metaLine(idv), addLine(f0)))
    val e1 = intercept[IllegalArgumentException] { DeltaLogReader.read(spark, t) }
    assert(e1.getMessage.contains("deletionVectors"))
    val t2 = Files.createTempDirectory("delta_guard2").toString
    val g0 = dataFile(Seq((1L, "a")).toDF("id", "v"), t2, "f0.parquet")
    commit(t2, 0, Seq(protoLine(),
      metaLine(idv, conf = Map("delta.columnMapping.mode" -> "name")), addLine(g0)))
    val e2 = intercept[IllegalArgumentException] { DeltaLogReader.read(spark, t2) }
    assert(e2.getMessage.contains("column mapping"))
    // reader feature the spec says needs no reader-side work passes
    val t3 = Files.createTempDirectory("delta_guard3").toString
    val h0 = dataFile(Seq((1L, "a")).toDF("id", "v"), t3, "f0.parquet")
    commit(t3, 0, Seq(protoLine(reader = 3, features = Seq("timestampNtz")),
      metaLine(idv), addLine(h0)))
    assert(DeltaLogReader.read(spark, t3).count() == 1)
  }
}
