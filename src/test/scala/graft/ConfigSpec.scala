package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.config._

class ConfigSpec extends AnyFunSuite {

  val sampleJson: String =
    """{
      |  "jobName": "share_price_daily",
      |  "sparkConfig": {
      |    "spark.sql.files.maxRecordsPerFile": "10000000",
      |    "spark.sql.files.maxPartitionBytes": "134217728"
      |  },
      |  "thresholdLimit": "30%",
      |  "duplicateRunCheck": true,
      |  "tempPath": "/tmp/graft-tmp",
      |  "preExecution": {"junkCharacterRemoval": true, "scripts": ["echo pre"]},
      |  "inputs": [
      |    {"dataFrameName": "prices", "format": "csv", "path": "/data/prices.csv",
      |     "header": true, "selectColumns": ["symbol", "price", "trade_ts"]},
      |    {"dataFrameName": "dim", "format": "parquet", "path": "/data/dim"},
      |    {"dataFrameName": "joined", "format": "sql",
      |     "sql": "SELECT * FROM prices p JOIN dim d ON p.symbol = d.symbol"}
      |  ],
      |  "validations": [
      |    {"type": "nullValueCheck", "dataFrameName": "prices", "primaryKeys": ["symbol", "trade_ts"]},
      |    {"type": "duplicateRecordCheck", "dataFrameName": "prices",
      |     "primaryKeys": ["symbol", "trade_ts"], "orderByCols": ["price"]}
      |  ],
      |  "transformations": [
      |    {"functionName": "daily_range",
      |     "sqlQuery": "SELECT symbol, max(price)-min(price) AS range FROM joined GROUP BY symbol",
      |     "outputDFName": "ranges", "countValidation": "1"}
      |  ],
      |  "sinks": [
      |    {"dataFrameName": "ranges", "loadType": "scdType2Insert", "format": "parquet",
      |     "path": "/out/ranges", "scdKeys": ["symbol"], "scdTrackedCols": ["range"]},
      |    {"dataFrameName": "ranges", "loadType": "simpleInsert", "format": "csv",
      |     "path": "/out/ranges_csv", "savemode": "overwrite", "singleFile": true,
      |     "outputFileNamePrefix": "ranges", "compression": "gzip"}
      |  ],
      |  "errorSink": {"dataFrameName": "errors", "format": "parquet", "path": "/out/errors"}
      |}""".stripMargin

  test("parses the full reference-shaped job config") {
    val cfg = JobConfig.parse(sampleJson)
    assert(cfg.jobName == "share_price_daily")
    assert(cfg.sparkConfig("spark.sql.files.maxPartitionBytes") == "134217728")
    assert(cfg.thresholdLimit.contains(0.30))
    assert(cfg.duplicateRunCheck)
    assert(cfg.preExecution.junkCharacterRemoval)
    assert(cfg.inputs.map(_.dataFrameName) == Seq("prices", "dim", "joined"))
    assert(cfg.inputs.head.selectColumns == Seq("symbol", "price", "trade_ts"))
    assert(cfg.inputs(2).format == "sql" && cfg.inputs(2).sql.nonEmpty)
    assert(cfg.validations.size == 2)
    assert(cfg.validations.head == NullValueCheck("prices", Seq("symbol", "trade_ts")))
    assert(cfg.validations(1) ==
      DuplicateRecordCheck("prices", Seq("symbol", "trade_ts"), Seq("price")))
    assert(cfg.transformations.head.outputDFName == "ranges")
    assert(cfg.transformations.head.countValidation.contains(1L))
    assert(cfg.sinks.size == 2)
    assert(cfg.sinks.head.loadType == "scdType2Insert")
    assert(cfg.sinks.head.scdKeys == Seq("symbol"))
    assert(cfg.sinks(1).singleFile && cfg.sinks(1).compression.contains("gzip"))
    assert(cfg.errorSink.nonEmpty)
  }

  test("threshold parsing accepts percent and fraction forms") {
    assert(JobConfig.parseThreshold("30%") == 0.30)
    assert(JobConfig.parseThreshold("0.25") == 0.25)
    assert(JobConfig.parseThreshold(" 5 %") == 0.05)
  }

  test("unknown keys are ignored; defaults hold") {
    val cfg = JobConfig.parse("""{"jobName":"x","mystery":42}""")
    assert(cfg.jobName == "x")
    assert(!cfg.duplicateRunCheck && cfg.inputs.isEmpty && cfg.thresholdLimit.isEmpty)
  }

  test("a typo'd validation type fails the parse instead of silently never running") {
    val e = intercept[RuntimeException] {
      JobConfig.parse("""{"jobName":"x","validations":[
        {"type":"nullValuCheck","dataFrameName":"t","primaryKeys":["k"]}]}""")
    }
    assert(e.getMessage.contains("unknown validation type 'nullvalucheck'"))
    val e2 = intercept[RuntimeException] {
      JobConfig.parse("""{"jobName":"x","validations":[{"dataFrameName":"t"}]}""")
    }
    assert(e2.getMessage.contains("validation needs a type"))
  }

  test("functionName steps parse with options; a step needs SQL or a name") {
    val cfg = JobConfig.parse(
      """{"jobName":"c","transformations":[
        |  {"functionName":"curate","outputDFName":"out",
        |   "options":{"input":"docs","minTokens":"7","jaccardThreshold":"0.6"}}
        |]}""".stripMargin)
    val t = cfg.transformations.head
    assert(t.functionName == "curate" && t.sqlQuery.isEmpty)
    assert(t.options == Map("input" -> "docs", "minTokens" -> "7",
      "jaccardThreshold" -> "0.6"))
    // neither sqlQuery nor functionName → loud parse error
    val e = intercept[RuntimeException] {
      JobConfig.parse(
        """{"jobName":"c","transformations":[{"outputDFName":"out"}]}""")
    }
    assert(e.getMessage.contains("sqlQuery or a functionName"))
  }

  test("named-operator dispatch: registered functions run, typos fail loudly") {
    val spark = TestSpark.spark
    spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .createOrReplaceTempView("docs_cfgspec")
    val out = new graft.run.Orchestrator(spark).run(JobConfig.parse(
      """{"jobName":"fn","transformations":[
        |  {"functionName":"textStats","outputDFName":"stats",
        |   "options":{"input":"docs_cfgspec","textCol":"text","idCol":"doc_id"}}
        |]}""".stripMargin))
    assert(out.columns.contains("n_tokens") && out.count() > 0)
    // unknown functionName names the registered set instead of no-opping
    val e = intercept[RuntimeException] {
      new graft.run.Orchestrator(spark).run(JobConfig.parse(
        """{"jobName":"fn2","transformations":[
          |  {"functionName":"curatee","outputDFName":"o",
          |   "options":{"input":"docs_cfgspec"}}]}""".stripMargin))
    }
    assert(e.getMessage.contains("not registered") &&
      e.getMessage.contains("curate"))
    // missing options.input is a config error, not an NPE
    val e2 = intercept[RuntimeException] {
      new graft.run.Orchestrator(spark).run(JobConfig.parse(
        """{"jobName":"fn3","transformations":[
          |  {"functionName":"curate","outputDFName":"o"}]}""".stripMargin))
    }
    assert(e2.getMessage.contains("options.input"))
    // stratifiedSample without fractions must fail loudly — an empty map
    // would keep every row, a silent no-op "sample"
    val e3 = intercept[RuntimeException] {
      new graft.run.Orchestrator(spark).run(JobConfig.parse(
        """{"jobName":"fn4","transformations":[
          |  {"functionName":"stratifiedSample","outputDFName":"o",
          |   "options":{"input":"docs_cfgspec","idCol":"doc_id"}}]}""".stripMargin))
    }
    assert(e3.getMessage.contains("options.fractions"))
    // and a malformed pair names itself instead of a bare MatchError
    val e4 = intercept[RuntimeException] {
      new graft.run.Orchestrator(spark).run(JobConfig.parse(
        """{"jobName":"fn5","transformations":[
          |  {"functionName":"stratifiedSample","outputDFName":"o",
          |   "options":{"input":"docs_cfgspec","idCol":"doc_id",
          |              "fractions":"en=0.5"}}]}""".stripMargin))
    }
    assert(e4.getMessage.contains("en=0.5"))
    // a TYPO'D option key must not silently run the default
    val e5 = intercept[RuntimeException] {
      new graft.run.Orchestrator(spark).run(JobConfig.parse(
        """{"jobName":"fn6","transformations":[
          |  {"functionName":"curate","outputDFName":"o",
          |   "options":{"input":"docs_cfgspec","jacardThreshold":"0.6"}}]}""".stripMargin))
    }
    assert(e5.getMessage.contains("jacardThreshold") &&
      e5.getMessage.contains("accepted:"))
    // and a malformed number names its key, not a bare NumberFormatException
    val e6 = intercept[RuntimeException] {
      new graft.run.Orchestrator(spark).run(JobConfig.parse(
        """{"jobName":"fn7","transformations":[
          |  {"functionName":"curate","outputDFName":"o",
          |   "options":{"input":"docs_cfgspec","minTokens":"five"}}]}""".stripMargin))
    }
    assert(e6.getMessage.contains("options.minTokens"))
  }

  test("multi-input dispatch: config-driven decontaminate equals the operator") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    docs.createOrReplaceTempView("docs_mi")
    val bench = docs.filter(pmod(col("doc_id"), lit(13)) === 0)
    bench.createOrReplaceTempView("bench_mi")
    val out = new graft.run.Orchestrator(spark).run(JobConfig.parse(
      """{"jobName":"mi","transformations":[
        |  {"functionName":"decontaminate","outputDFName":"clean",
        |   "options":{"input":"docs_mi","benchmark":"bench_mi",
        |              "textCol":"text","idCol":"doc_id"}}
        |]}""".stripMargin))
    val direct = graft.x.TextAnalysis.decontaminate(docs, bench, "text", "doc_id")
    assert(out.count() == direct.count() &&
      out.exceptAll(direct).isEmpty && direct.exceptAll(out).isEmpty,
      "config-dispatched decontaminate diverged from the direct operator")
    // second view missing → names the key, not an NPE
    val e = intercept[RuntimeException] {
      new graft.run.Orchestrator(spark).run(JobConfig.parse(
        """{"jobName":"mi2","transformations":[
          |  {"functionName":"decontaminate","outputDFName":"o",
          |   "options":{"input":"docs_mi"}}]}""".stripMargin))
    }
    assert(e.getMessage.contains("options.benchmark"))
  }
}
