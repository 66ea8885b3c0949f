package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.config.JobConfig
import graft.run.Orchestrator
import java.nio.file.Files

/** The declarative job model in streaming mode (`"mode": "streaming"`):
  * same config shape, file-stream sources, shared SQL chain, foreachBatch
  * sinks — including SCD2 per micro-batch. */
class StreamingOrchestratorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sfDir

  private lazy val eventsDir: String = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = Files.createTempDirectory("graft-sevents").toString
    spark.read.parquet(s"$sf/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("streaming job: source -> dedup validation -> SQL -> parquet sink") {
    val out = Files.createTempDirectory("graft-sout").toString
    val nEvents = spark.read.parquet(eventsDir).count()
    val cfg = JobConfig.parse(
      s"""{
         |"jobName": "stream_purchases",
         |"mode": "streaming",
         |"tempPath": "$out/ckpt",
         |"inputs": [{"dataFrameName": "events", "format": "parquet", "path": "$eventsDir",
         |  "watermarkColumn": "ts", "watermarkDelay": "1 day",
         |  "options": {"maxFilesPerTrigger": "10"}}],
         |"validations": [
         |  {"type": "duplicateRecordCheck", "dataFrameName": "events",
         |   "primaryKeys": ["event_id"], "orderByCols": ["ts"]}],
         |"transformations": [{"functionName": "purchases",
         |  "sqlQuery": "SELECT event_id, user_id, value FROM events WHERE event_type = 'purchase'",
         |  "outputDFName": "purchases"}],
         |"sinks": [{"dataFrameName": "purchases", "format": "parquet",
         |  "path": "$out/purchases", "savemode": "append"}]
         |}""".stripMargin)
    new Orchestrator(spark).run(cfg)
    val written = spark.read.parquet(s"$out/purchases")
    val expected = spark.read.parquet(eventsDir)
      .filter(col("event_type") === "purchase").count()
    assert(written.count() == expected)
    assert(written.columns.toSet == Set("event_id", "user_id", "value"))
  }

  test("unwatermarked aggregation in append mode fails fast, not silently") {
    val out = Files.createTempDirectory("graft-sscd").toString
    val cfg = JobConfig.parse(
      s"""{
         |"jobName": "stream_scd",
         |"mode": "streaming",
         |"tempPath": "$out/ckpt",
         |"inputs": [{"dataFrameName": "events", "format": "parquet", "path": "$eventsDir",
         |  "options": {"maxFilesPerTrigger": "10"}}],
         |"transformations": [{"functionName": "user_last",
         |  "sqlQuery": "SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id",
         |  "outputDFName": "user_counts"}],
         |"sinks": [{"dataFrameName": "user_counts", "format": "parquet",
         |  "path": "$out/counts", "savemode": "append"}]
         |}""".stripMargin)
    // aggregate without watermark in append mode is invalid — complete mode
    // isn't what foreachBatch sinks use, so the engine should surface the
    // analysis error rather than hang
    intercept[Exception] { new Orchestrator(spark).run(cfg) }
  }
}
