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

  test("add.stats zone maps: written in spec shape, pruned reads skip files") {
    val t = table()
    // three single-file commits with disjoint id ranges + one all-null batch
    def batch(r: Seq[Option[Long]]) = r.toDF("id").coalesce(1)
    DeltaLogWriter.write(batch((1L to 10L).map(Some(_))), t, statsCols = Seq("id"))
    DeltaLogWriter.write(batch((11L to 20L).map(Some(_))), t, statsCols = Seq("id"))
    DeltaLogWriter.write(batch((21L to 30L).map(Some(_))), t, statsCols = Seq("id"))
    DeltaLogWriter.write(batch(Seq(None, None)), t, statsCols = Seq("id"))
    // the commit JSON carries stats as a STRING field in spec shape
    val line = Files.readAllLines(Paths.get(t, "_delta_log").resolve(
      f"${0L}%020d.json")).asScala.find(_.contains("\"add\"")).get
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val statsNode = mapper.readTree(line).get("add").get("stats")
    assert(statsNode.isTextual, "stats must be a JSON-encoded string field")
    val stats = mapper.readTree(statsNode.asText())
    assert(stats.get("numRecords").asLong() == 10L)
    assert(stats.get("minValues").get("id").asLong() == 1L)
    assert(stats.get("maxValues").get("id").asLong() == 10L)
    assert(stats.get("nullCount").get("id").asLong() == 0L)

    // pruning: a [12, 18] window keeps exactly the middle file (the
    // all-NULL file is provably skippable for BETWEEN)
    val (state, _) = DeltaLogReader.loadState(spark, t, None)
    val field = org.apache.spark.sql.types.StructField("id",
      org.apache.spark.sql.types.LongType)
    val (kept, skipped) = DeltaLogReader.pruneByStats(state, field, 12L, 18L)
    assert(kept.size == 1 && skipped.size == 3,
      s"expected 1 kept / 3 skipped, got $kept / $skipped")
    // and the pruned result equals the unpruned filter exactly
    val pruned = DeltaLogReader.readPruned(spark, t, "id", 12L, 18L)
      .as[Long].collect().sorted.toSeq
    assert(pruned == (12L to 18L).toSeq)
    // a file without stats is never skipped: strip stats via checkpoint-free
    // manual commit is covered by the None branch in pruneByStats — the
    // all-None case is the legacy-table shape, asserted through a statless write
    val t2 = table()
    DeltaLogWriter.write((1L to 5L).toDF("id").coalesce(1), t2) // no statsCols
    val (s2, _) = DeltaLogReader.loadState(spark, t2, None)
    val (k2, sk2) = DeltaLogReader.pruneByStats(s2, field, 100L, 200L)
    assert(k2.size == 1 && sk2.isEmpty, "statless files must always be read")
  }

  test("mergeSchema append evolves the table; old files null-fill new columns") {
    val t = table()
    DeltaLogWriter.write(Seq((1L, "a")).toDF("id", "v"), t)
    // plain append with a wider batch still fails loudly
    intercept[IllegalArgumentException](
      DeltaLogWriter.write(Seq((2L, "b", 9L)).toDF("id", "v", "score"), t))
    // mergeSchema admits it and re-emits metaData with the merged schema
    DeltaLogWriter.write(Seq((2L, "b", 9L)).toDF("id", "v", "score"), t,
      mergeSchema = true)
    val now = DeltaLogReader.read(spark, t)
    assert(now.columns.toSeq == Seq("id", "v", "score"))
    val rows = now.as[(Long, String, Option[Long])].collect().sortBy(_._1).toSeq
    assert(rows == Seq((1L, "a", None), (2L, "b", Some(9L))),
      "pre-evolution rows must null-fill the added column")
    // time travel to v0 still shows the original two-column schema
    assert(DeltaLogReader.read(spark, t, Some(0L)).columns.toSeq == Seq("id", "v"))
    // a type change is never mergeable
    val e = intercept[IllegalArgumentException](
      DeltaLogWriter.write(Seq((3L, 5.0, 1L)).toDF("id", "v", "score"), t,
        mergeSchema = true))
    assert(e.getMessage.contains("cannot change column"))
    // a batch MISSING an old column merges too (its files null-fill 'v')
    DeltaLogWriter.write(Seq((4L, 7L)).toDF("id", "score"), t, mergeSchema = true)
    val after = DeltaLogReader.read(spark, t)
      .as[(Long, Option[String], Option[Long])].collect().sortBy(_._1).toSeq
    assert(after == Seq((1L, Some("a"), None), (2L, Some("b"), Some(9L)),
      (4L, None, Some(7L))))
  }

  test("stats survive checkpoint compaction; timestamp stats prune correctly") {
    val t = table()
    def tsDf(day: Int) = Seq.tabulate(4)(i =>
      java.sql.Timestamp.valueOf(f"2024-01-$day%02d 0$i:00:00.5")).toDF("ts")
    DeltaLogWriter.write(tsDf(1).coalesce(1), t, statsCols = Seq("ts"))
    DeltaLogWriter.write(tsDf(2).coalesce(1), t, statsCols = Seq("ts"))
    DeltaLogWriter.write(tsDf(3).coalesce(1), t, statsCols = Seq("ts"))
    DeltaLogWriter.checkpoint(spark, t)
    // force the reader through the checkpoint by vacuuming early commits
    (0L to 1L).foreach(v =>
      Files.delete(Paths.get(t, "_delta_log").resolve(f"$v%020d.json")))
    val out = DeltaLogReader.readPruned(spark, t, "ts",
        "2024-01-02 00:00:00", "2024-01-02 23:59:59")
      .as[java.sql.Timestamp].collect()
    assert(out.length == 4 && out.forall(_.toString.startsWith("2024-01-02")))
    val (state, _) = DeltaLogReader.loadState(spark, t, None)
    val field = org.apache.spark.sql.types.StructField("ts",
      org.apache.spark.sql.types.TimestampType)
    val (kept, skipped) = DeltaLogReader.pruneByStats(state, field,
      "2024-01-02 00:00:00", "2024-01-02 23:59:59")
    assert(kept.size == 1 && skipped.size == 2,
      "checkpointed stats must still drive skipping")
  }

  test("snapshotDiff classifies added/removed/changed across versions") {
    val t = table()
    DeltaLogWriter.write(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), t) // v0
    DeltaLogWriter.write(
      Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("id", "v"), t, "overwrite")       // v1
    val diff = DeltaLogReader.snapshotDiff(spark, t, 0L, 1L, Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(diff == Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
    // null-vs-value must not collide: (null) → ("x") is a change
    val t2 = table()
    DeltaLogWriter.write(Seq((1L, Option.empty[String])).toDF("id", "v"), t2)
    DeltaLogWriter.write(Seq((1L, Option("x"))).toDF("id", "v"), t2, "overwrite")
    val d2 = DeltaLogReader.snapshotDiff(spark, t2, 0L, 1L, Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d2 == Map(1L -> "changed"))
    // a NULL key is a value (the Scd2/Upsert key contract): it matches
    // itself across versions — changed here, never a spurious added+removed
    val t3 = table()
    DeltaLogWriter.write(Seq((Option.empty[Long], "a")).toDF("id", "v"), t3)
    DeltaLogWriter.write(
      Seq((Option.empty[Long], "A")).toDF("id", "v"), t3, "overwrite")
    val d3 = DeltaLogReader.snapshotDiff(spark, t3, 0L, 1L, Seq("id"))
      .collect().map(r =>
        (if (r.isNullAt(0)) None else Some(r.getLong(0))) -> r.getString(1)).toMap
    assert(d3 == Map(Option.empty[Long] -> "changed"))
  }

  test("vacuum deletes only unreferenced files; vacuumed versions fail loudly") {
    val t = table()
    DeltaLogWriter.write(Seq((1L, "old")).toDF("id", "v"), t)                // v0
    DeltaLogWriter.write(Seq((2L, "mid")).toDF("id", "v"), t, "overwrite")   // v1
    DeltaLogWriter.write(Seq((3L, "new")).toDF("id", "v"), t, "overwrite")   // v2
    val deleted = DeltaLogWriter.vacuum(spark, t, keepVersions = 2)
    assert(deleted.nonEmpty, "v0's overwritten file must be reclaimed")
    // retained versions read exactly as before
    assert(DeltaLogReader.read(spark, t)
      .as[(Long, String)].collect().toSeq == Seq((3L, "new")))
    assert(DeltaLogReader.read(spark, t, Some(1L))
      .as[(Long, String)].collect().toSeq == Seq((2L, "mid")))
    // the vacuumed snapshot errors at scan, never a silent partial read
    val err = intercept[Exception] {
      DeltaLogReader.read(spark, t, Some(0L)).collect()
    }
    assert(err != null)
    // idempotent: nothing else to reclaim
    assert(DeltaLogWriter.vacuum(spark, t, keepVersions = 2).isEmpty)
  }
}
