package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.config.{DeploySpec, JobConfig}
import graft.run.{Orchestrator, PipelineRunner, PipelineStep}
import graft.sources.SourceReader
import java.nio.file.{Files, Paths}

class DeployAndHooksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sfDir

  test("deploy.yaml-shaped spec parses (reference deploy surface)") {
    val spec = DeploySpec.parse(
      """pipelineName: share-price
        |cron: "0 12 * * 1-5"
        |paused: "false"
        |startDate: "2021-01-01"
        |concurrency: 4
        |maximumRetries: 3
        |executorMemory: 20g
        |driverMemory: 20g
        |executorCores: 7
        |cluster:
        |  onDemandCores: 16
        |  spotCores: 32
        |""".stripMargin)
    assert(spec.pipelineName == "share-price")
    assert(spec.scheduleCron.contains("0 12 * * 1-5"))
    assert(spec.concurrency == 4 && spec.maximumRetries == 3)
    assert(spec.sparkConf == Map(
      "spark.executor.memory" -> "20g",
      "spark.driver.memory" -> "20g",
      "spark.executor.cores" -> "7"))
    assert(spec.clusterConfig("spotCores") == "32")
  }

  test("pre/post-exec scripts run; a failing script aborts the job") {
    val tmp = Files.createTempDirectory("graft-hooks").toString
    val cfg = JobConfig.parse(
      s"""{
         |"jobName": "hooks",
         |"preExecution": {"scripts": ["echo pre > $tmp/pre.txt"]},
         |"postExecutionScripts": ["echo post > $tmp/post.txt"],
         |"inputs": [{"dataFrameName": "r", "format": "parquet", "path": "$sf/region.parquet"}],
         |"transformations": [{"functionName": "t", "sqlQuery": "SELECT * FROM r", "outputDFName": "o"}]
         |}""".stripMargin)
    new Orchestrator(spark).run(cfg)
    assert(Files.exists(Paths.get(s"$tmp/pre.txt")) && Files.exists(Paths.get(s"$tmp/post.txt")))

    val bad = cfg.copy(preExecution = cfg.preExecution.copy(scripts = Seq("exit 3")))
    intercept[IllegalStateException] { new Orchestrator(spark).run(bad) }
  }

  test("junkCharacterRemoval cleans every string column at phase_1") {
    val tmp = Files.createTempDirectory("graft-junk").toString
    import spark.implicits._
    Seq((1L, "oktext", "clean")).toDF("id", "a", "b")
      .write.mode("overwrite").parquet(s"$tmp/in")
    val cfg = JobConfig.parse(
      s"""{
         |"jobName": "junk",
         |"preExecution": {"junkCharacterRemoval": true},
         |"inputs": [{"dataFrameName": "d", "format": "parquet", "path": "$tmp/in"}],
         |"transformations": [{"functionName": "t", "sqlQuery": "SELECT * FROM d", "outputDFName": "o"}]
         |}""".stripMargin)
    val out = new Orchestrator(spark).run(cfg)
    assert(out.select("a").as[String].head() == "oktext")
  }

  test("metadata mapping file drives schema-on-read (spark.json:21-22)") {
    val tmp = Files.createTempDirectory("graft-meta").toString
    Files.writeString(Paths.get(s"$tmp/mapping.json"),
      """[{"sourceColumn": "r_regionkey", "targetColumn": "region_id", "dataType": "bigint"},
        |{"sourceColumn": "r_name", "targetColumn": "region_name", "dataType": "string"}]""".stripMargin)
    val df = SourceReader.read(spark, graft.config.InputSpec(
      "regions_mapped", "parquet", Some(s"$sf/region.parquet"),
      metadataPath = Some(s"$tmp/mapping.json")))
    assert(df.columns.toSeq == Seq("region_id", "region_name"))
    assert(df.schema("region_id").dataType.typeName == "long")
    assert(df.count() == 5)
  }

  test("parallel step groups produce the same outputs as sequential runs") {
    val base = Files.createTempDirectory("graft-par").toString
    def step(name: String, table: String): PipelineStep = PipelineStep(name, JobConfig.parse(
      s"""{
         |"jobName": "$name",
         |"inputs": [{"dataFrameName": "in_$name", "format": "parquet", "path": "$sf/$table.parquet"}],
         |"transformations": [{"functionName": "t",
         |  "sqlQuery": "SELECT COUNT(*) AS n FROM in_$name", "outputDFName": "out_$name"}],
         |"sinks": [{"dataFrameName": "out_$name", "format": "parquet",
         |  "path": "$base/$name", "savemode": "overwrite"}]
         |}""".stripMargin))
    new PipelineRunner(spark).runGroups(Seq(
      Seq(step("s_orders", "orders"), step("s_lineitem", "lineitem"), step("s_customer", "customer")),
      Seq(step("s_region", "region"))), concurrency = 3)
    assert(spark.read.parquet(s"$base/s_orders").head().getLong(0) == 1500)
    assert(spark.read.parquet(s"$base/s_lineitem").head().getLong(0) == 6000)
    assert(spark.read.parquet(s"$base/s_customer").head().getLong(0) == 150)
    assert(spark.read.parquet(s"$base/s_region").head().getLong(0) == 5)
  }
}
