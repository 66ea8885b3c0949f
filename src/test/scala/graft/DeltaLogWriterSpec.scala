package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{DeltaLogReader, DeltaLogWriter}
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** The write half of the Delta protocol: commits this engine publishes
  * must replay through the (protocol-exact) reader, version by version. */
class DeltaLogWriterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def table() = Files.createTempDirectory("delta_w").resolve("t").toString

  test("append commits round-trip through the reader with time travel") {
    val t = table()
    val v0 = DeltaLogWriter.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t)
    val v1 = DeltaLogWriter.write(Seq((3L, "c")).toDF("id", "v"), t)
    assert(v0 == 0L && v1 == 1L)
    assert(DeltaLogReader.isDeltaTable(t))
    val now = DeltaLogReader.read(spark, t)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(now == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    val atV0 = DeltaLogReader.read(spark, t, Some(0L))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(atV0 == Seq((1L, "a"), (2L, "b")))
  }

  test("overwrite tombstones prior files; old versions stay readable") {
    val t = table()
    DeltaLogWriter.write(Seq((1L, "old")).toDF("id", "v"), t)
    DeltaLogWriter.write(Seq((9L, "new")).toDF("id", "v"), t, "overwrite")
    assert(DeltaLogReader.read(spark, t)
      .as[(Long, String)].collect().toSeq == Seq((9L, "new")))
    assert(DeltaLogReader.read(spark, t, Some(0L))
      .as[(Long, String)].collect().toSeq == Seq((1L, "old")))
  }

  test("append with a different schema fails loudly; overwrite may replace it") {
    val t = table()
    DeltaLogWriter.write(Seq((1L, "a")).toDF("id", "v"), t)
    intercept[IllegalArgumentException] {
      DeltaLogWriter.write(Seq((2L, 5.0)).toDF("id", "score"), t)
    }
    DeltaLogWriter.write(Seq((2L, 5.0)).toDF("id", "score"), t, "overwrite")
    val df = DeltaLogReader.read(spark, t)
    assert(df.schema.fieldNames.toSeq == Seq("id", "score"))
    assert(df.as[(Long, Double)].collect().toSeq == Seq((2L, 5.0)))
  }

  test("commit zero carries protocol + metaData in spec shape") {
    val t = table()
    DeltaLogWriter.write(Seq((1L, "a")).toDF("id", "v"), t)
    val lines = Files.readAllLines(
      Paths.get(t, "_delta_log", "0" * 19 + "0.json")).asScala.filter(_.nonEmpty)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val nodes = lines.map(mapper.readTree)
    val proto = nodes.find(_.has("protocol")).get.get("protocol")
    assert(proto.get("minReaderVersion").asInt() == 1)
    assert(proto.get("minWriterVersion").asInt() == 2)
    val md = nodes.find(_.has("metaData")).get.get("metaData")
    assert(md.get("format").get("provider").asText() == "parquet")
    assert(md.get("partitionColumns").size() == 0)
    // schemaString is the spec's serialization — the reader parses it back
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(md.get("schemaString").asText())
    assert(schema.isInstanceOf[org.apache.spark.sql.types.StructType])
    val adds = nodes.filter(_.has("add")).map(_.get("add"))
    assert(adds.nonEmpty && adds.forall(a =>
      a.get("dataChange").asBoolean() && a.get("size").asLong() > 0))
  }

  test("checkpoints compact the log; reader survives vacuumed early commits") {
    val t = table()
    // interval 4 → checkpoints at versions 3, 7, 11
    (0 until 12).foreach(i =>
      DeltaLogWriter.write(Seq((i.toLong, s"v$i")).toDF("id", "v"), t,
        checkpointInterval = 4))
    val log = Paths.get(t, "_delta_log")
    assert(Files.exists(log.resolve("0" * 19 + "3.checkpoint.parquet")))
    assert(Files.exists(log.resolve("0" * 18 + "11.checkpoint.parquet")))
    assert(Files.exists(log.resolve("_last_checkpoint")))
    // vacuum the history BEFORE the newest checkpoint: commits 0..10 gone
    (0 until 11).foreach(v =>
      Files.delete(log.resolve(f"$v%020d.json")))
    val rows = DeltaLogReader.read(spark, t)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(rows == (0 until 12).map(i => (i.toLong, s"v$i")))
  }

  test("upsertDelta: MERGE semantics as one commit; pre-merge versions time-travel") {
    val t = table()
    val seed = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    assert(graft.operators.Upsert.upsertDelta(spark, seed, t, Seq("id")) == 0L)
    // batch rewrites key 2, inserts key 4; keys 1 and 3 carry forward
    val batch = Seq((2L, "B!"), (4L, "d")).toDF("id", "v")
    val v1 = graft.operators.Upsert.upsertDelta(spark, batch, t, Seq("id"))
    assert(v1 == 1L)
    val now = DeltaLogReader.read(spark, t)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(now == Seq((1L, "a"), (2L, "B!"), (3L, "c"), (4L, "d")))
    // the merge is ONE atomic commit; the pre-merge snapshot is intact
    val atV0 = DeltaLogReader.read(spark, t, Some(0L))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(atV0 == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // re-running the same batch converges (retry safety at table level)
    graft.operators.Upsert.upsertDelta(spark, batch, t, Seq("id"))
    val again = DeltaLogReader.read(spark, t)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(again == now)
  }

  test("the config-driven sink writes a real log the source auto-detects") {
    val t = table()
    val sink = graft.config.SinkSpec(dataFrameName = "d", format = "deltalake",
      path = Some(t), options = Map("log" -> "delta"))
    graft.sinks.SinkWriter.write(spark, Seq((1L, "x")).toDF("id", "v"), sink)
    assert(Files.isDirectory(Paths.get(t, "_delta_log")))
    assert(DeltaLogReader.read(spark, t)
      .as[(Long, String)].collect().toSeq == Seq((1L, "x")))
  }
}
