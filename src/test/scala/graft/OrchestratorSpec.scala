package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.config.JobConfig
import graft.run.{Orchestrator, PipelineRunner, PipelineStep}
import java.nio.file.{Files, Paths}

/** End-to-end job + pipeline runs mirroring the reference's 4-step
  * share-price DAG shape (fetch → calculate_daily_range → register → scd2,
  * /root/reference/example-shareprice.py:148-153) over the fixtures. */
class OrchestratorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sfDir

  private def tmpDir(): String =
    Files.createTempDirectory("graft-orch").toString

  test("single job: inputs → validations → SQL chain → parquet sink → error sink") {
    val out = tmpDir()
    val cfg = JobConfig.parse(
      s"""{
         |"jobName": "daily_range",
         |"thresholdLimit": "90%",
         |"inputs": [
         |  {"dataFrameName": "orders", "format": "parquet", "path": "$sf/orders.parquet"},
         |  {"dataFrameName": "lineitem", "format": "parquet", "path": "$sf/lineitem.parquet",
         |   "selectColumns": ["l_orderkey", "l_extendedprice", "l_linenumber"]}
         |],
         |"validations": [
         |  {"type": "duplicateRecordCheck", "dataFrameName": "lineitem",
         |   "primaryKeys": ["l_orderkey", "l_linenumber"], "orderByCols": ["l_extendedprice"]}
         |],
         |"transformations": [
         |  {"functionName": "daily_range",
         |   "sqlQuery": "SELECT CAST(o.o_orderdate AS DATE) AS trade_date, MAX(l.l_extendedprice) - MIN(l.l_extendedprice) AS price_range FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey GROUP BY CAST(o.o_orderdate AS DATE)",
         |   "outputDFName": "ranges", "countValidation": "100"}
         |],
         |"sinks": [
         |  {"dataFrameName": "ranges", "loadType": "simpleInsert", "format": "parquet",
         |   "path": "$out/ranges", "savemode": "overwrite", "reconciliation": true}
         |],
         |"errorSink": {"dataFrameName": "errors", "format": "parquet", "path": "$out/errors"}
         |}""".stripMargin)
    new Orchestrator(spark).run(cfg)
    val written = spark.read.parquet(s"$out/ranges")
    assert(written.count() > 100)
    assert(written.columns.toSet == Set("trade_date", "price_range"))
    // fixture lineitem has duplicate (okey, lineno) pairs → error sink written
    val errs = spark.read.parquet(s"$out/errors")
    assert(errs.count() > 0)
    assert(errs.columns.contains("error_reason") && errs.columns.contains("error_job"))
  }

  test("append sinks reconcile against the written delta, not the whole target") {
    val out = tmpDir()
    def cfg(sinkJson: String) = JobConfig.parse(
      s"""{
         |"jobName": "append_recon",
         |"inputs": [{"dataFrameName": "nation", "format": "parquet", "path": "$sf/nation.parquet"}],
         |"transformations": [
         |  {"functionName": "pick",
         |   "sqlQuery": "SELECT n_nationkey, n_name FROM nation",
         |   "outputDFName": "picked"}
         |],
         |"sinks": [$sinkJson]
         |}""".stripMargin)
    // plain-format append: target grows by exactly the batch on every run
    val pq =
      s"""{"dataFrameName": "picked", "loadType": "simpleInsert", "format": "parquet",
         | "path": "$out/pq", "savemode": "append", "reconciliation": true}""".stripMargin
    new Orchestrator(spark).run(cfg(pq))
    new Orchestrator(spark).run(cfg(pq))
    assert(spark.read.parquet(s"$out/pq").count() == 50) // 25 nations × 2 appends
    // delta-format append: the change feed replays the batch for a FULL
    // count+checksum reconcile (stronger than the count-delta above)
    val dl =
      s"""{"dataFrameName": "picked", "loadType": "simpleInsert", "format": "delta",
         | "path": "$out/dl", "savemode": "append", "reconciliation": true}""".stripMargin
    new Orchestrator(spark).run(cfg(dl))
    new Orchestrator(spark).run(cfg(dl))
    assert(graft.sources.VersionedParquet.read(spark, s"$out/dl").count() == 50)
  }

  test("threshold gate aborts a job with too many invalid rows") {
    val out = tmpDir()
    val cfg = JobConfig.parse(
      s"""{
         |"jobName": "gate",
         |"thresholdLimit": "1%",
         |"inputs": [{"dataFrameName": "li", "format": "parquet", "path": "$sf/lineitem.parquet"}],
         |"validations": [
         |  {"type": "duplicateRecordCheck", "dataFrameName": "li",
         |   "primaryKeys": ["l_returnflag"], "orderByCols": ["l_orderkey"]}
         |],
         |"sinks": [{"dataFrameName": "li", "format": "parquet", "path": "$out/x", "savemode": "overwrite"}]
         |}""".stripMargin)
    intercept[IllegalStateException] { new Orchestrator(spark).run(cfg) }
  }

  test("duplicate-run guard blocks concurrent runs, releases after completion") {
    val tmp = tmpDir()
    val mk = (name: String) => JobConfig.parse(
      s"""{
         |"jobName": "$name", "duplicateRunCheck": true, "tempPath": "$tmp",
         |"inputs": [{"dataFrameName": "r", "format": "parquet", "path": "$sf/region.parquet"}],
         |"transformations": [{"functionName": "t", "sqlQuery": "SELECT * FROM r", "outputDFName": "o"}]
         |}""".stripMargin)
    // a concurrent run holds the marker → refused
    Files.createFile(Paths.get(tmp, "guarded_RUNNING"))
    intercept[IllegalStateException] { new Orchestrator(spark).run(mk("guarded")) }
    Files.delete(Paths.get(tmp, "guarded_RUNNING"))
    // normal run: succeeds, releases the marker, records success —
    // so a sequential re-run (and the pipeline retry loop) still works
    new Orchestrator(spark).run(mk("guarded"))
    assert(!Files.exists(Paths.get(tmp, "guarded_RUNNING")))
    assert(Files.exists(Paths.get(tmp, "guarded_SUCCESS")))
    new Orchestrator(spark).run(mk("guarded"))
    // a FAILED run must also release the marker (retry-ability)
    val bad = mk("failing").copy(transformations = Seq(
      graft.config.TransformStep("t", "SELECT * FROM does_not_exist", "o")))
    intercept[Exception] { new Orchestrator(spark).run(bad) }
    assert(!Files.exists(Paths.get(tmp, "failing_RUNNING")))
  }

  test("4-step pipeline: fetch → daily_range → register → scd2 (reference DAG shape)") {
    val base = tmpDir()
    // step 1 "fetch_prices": project the raw orders feed to a staging table
    val fetch = JobConfig.parse(
      s"""{
         |"jobName": "fetch_prices",
         |"inputs": [{"dataFrameName": "orders", "format": "parquet", "path": "$sf/orders.parquet"}],
         |"transformations": [{"functionName": "stage",
         |  "sqlQuery": "SELECT o_orderkey, o_custkey, o_totalprice, CAST(o_orderdate AS DATE) AS trade_date FROM orders",
         |  "outputDFName": "prices"}],
         |"sinks": [{"dataFrameName": "prices", "format": "parquet", "path": "$base/prices", "savemode": "overwrite"}]
         |}""".stripMargin)
    // step 2 "calculate_daily_range"
    val calc = JobConfig.parse(
      s"""{
         |"jobName": "calculate_daily_range",
         |"inputs": [{"dataFrameName": "prices", "format": "parquet", "path": "$base/prices"}],
         |"transformations": [{"functionName": "range",
         |  "sqlQuery": "SELECT trade_date, MAX(o_totalprice) - MIN(o_totalprice) AS price_range, COUNT(*) AS n FROM prices GROUP BY trade_date",
         |  "outputDFName": "ranges"}],
         |"sinks": [{"dataFrameName": "ranges", "format": "parquet", "path": "$base/ranges", "savemode": "overwrite"}]
         |}""".stripMargin)
    // step 3 "register": dedup + quality-gate the ranges
    val register = JobConfig.parse(
      s"""{
         |"jobName": "register",
         |"thresholdLimit": "50%",
         |"inputs": [{"dataFrameName": "ranges", "format": "parquet", "path": "$base/ranges"}],
         |"validations": [
         |  {"type": "nullValueCheck", "dataFrameName": "ranges", "primaryKeys": ["trade_date"]}],
         |"transformations": [{"functionName": "registered",
         |  "sqlQuery": "SELECT trade_date, price_range, n FROM ranges", "outputDFName": "registered"}],
         |"sinks": [{"dataFrameName": "registered", "format": "parquet", "path": "$base/registered", "savemode": "overwrite"}]
         |}""".stripMargin)
    // step 4 "scd2_daily_ranges": SCD2-load the dimension
    val scd2 = JobConfig.parse(
      s"""{
         |"jobName": "scd2_daily_ranges",
         |"inputs": [{"dataFrameName": "registered", "format": "parquet", "path": "$base/registered"}],
         |"transformations": [{"functionName": "dim_in",
         |  "sqlQuery": "SELECT trade_date, price_range, n FROM registered", "outputDFName": "dim_in"}],
         |"sinks": [{"dataFrameName": "dim_in", "loadType": "scdType2Insert", "format": "parquet",
         |  "path": "$base/dim", "scdKeys": ["trade_date"], "scdTrackedCols": ["price_range", "n"]}]
         |}""".stripMargin)

    new PipelineRunner(spark).run(Seq(
      PipelineStep("fetch_prices", fetch),
      PipelineStep("calculate_daily_range", calc),
      PipelineStep("register", register),
      PipelineStep("scd2_daily_ranges", scd2)))

    val dim = spark.read.parquet(s"$base/dim")
    val nDates = spark.read.parquet(s"$base/ranges").count()
    assert(dim.count() == nDates) // first load: one current version per date
    assert(dim.filter(col("is_current")).count() == nDates)

    // run step 4 again with mutated input → changed keys get second versions
    spark.read.parquet(s"$base/registered")
      .withColumn("price_range",
        when(dayofmonth(col("trade_date")) === 1, col("price_range") + 1).otherwise(col("price_range")))
      .write.mode("overwrite").parquet(s"$base/registered2")
    val scd2b = JobConfig.parse(scdJson(base))
    new Orchestrator(spark).run(scd2b)
    val dim2 = spark.read.parquet(s"$base/dim")
    assert(dim2.filter(col("is_current")).count() == nDates)
    assert(dim2.count() > nDates) // closed versions exist
    assert(dim2.filter(!col("is_current")).count() == dim2.count() - nDates)
  }

  private def scdJson(base: String): String =
    s"""{
       |"jobName": "scd2_again",
       |"inputs": [{"dataFrameName": "registered", "format": "parquet", "path": "$base/registered2"}],
       |"transformations": [{"functionName": "dim_in",
       |  "sqlQuery": "SELECT trade_date, price_range, n FROM registered", "outputDFName": "dim_in"}],
       |"sinks": [{"dataFrameName": "dim_in", "loadType": "scdType2Insert", "format": "parquet",
       |  "path": "$base/dim", "scdKeys": ["trade_date"], "scdTrackedCols": ["price_range", "n"]}]
       |}""".stripMargin

  test("plan audit: flags cartesian/BNLJ, strict mode fails the job pre-execution") {
    import spark.implicits._
    Seq((1L, "a")).toDF("id", "v").createOrReplaceTempView("pa_l")
    Seq((2L, "b")).toDF("id", "w").createOrReplaceTempView("pa_r")
    // a tiny side gets broadcast, so the cross join plans as BNLJ (warn);
    // with broadcast off it is the true CartesianProduct (error) — the
    // shape it takes when BOTH sides are big, which is the fatal case
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val (cross, crossF) =
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val df = spark.sql("SELECT * FROM pa_l CROSS JOIN pa_r")
        (df, graft.util.PlanAudit.audit(df)) // plan fixed while broadcast is off
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    assert(crossF.exists(f => f.severity == "error" && f.node == "CartesianProduct"))
    val theta = spark.sql("SELECT * FROM pa_l l JOIN pa_r r ON l.id < r.id")
    assert(graft.util.PlanAudit.audit(theta)
      .exists(f => f.severity == "warn" && f.node == "BroadcastNestedLoopJoin"))
    // an equi join is clean (broadcast or sort-merge, either way no finding)
    val equi = spark.sql("SELECT * FROM pa_l l JOIN pa_r r ON l.id = r.id")
    assert(graft.util.PlanAudit.audit(equi).forall(_.severity == "info"))
    intercept[RuntimeException](graft.util.PlanAudit.assertSafe(cross))

    // strict mode stops the step BEFORE execution; warn mode lets it run
    val out = tmpDir()
    def cfg(mode: String) = JobConfig.parse(
      s"""{
         |"jobName": "audit_$mode", "planAudit": "$mode",
         |"inputs": [
         |  {"dataFrameName": "nation", "format": "parquet", "path": "$sf/nation.parquet"},
         |  {"dataFrameName": "region", "format": "parquet", "path": "$sf/region.parquet"}
         |],
         |"transformations": [
         |  {"functionName": "boom",
         |   "sqlQuery": "SELECT * FROM nation CROSS JOIN region",
         |   "outputDFName": "boom_out"}
         |],
         |"sinks": [
         |  {"dataFrameName": "boom_out", "loadType": "simpleInsert",
         |   "format": "parquet", "path": "$out/boom_$mode", "savemode": "overwrite"}
         |]
         |}""".stripMargin)
    val e = intercept[RuntimeException](new Orchestrator(spark).run(cfg("strict")))
    assert(e.getMessage.contains("plan audit failed"))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$out/boom_strict")),
      "strict audit must fail before the sink writes")
    new Orchestrator(spark).run(cfg("warn")) // intentional tiny cross: runs
    assert(spark.read.parquet(s"$out/boom_warn").count() == 25 * 5)
  }

  test("repeatedSubtrees: flags a shuffle pipeline re-expanded by a " +
      "twice-referenced view; a shuffle-free view re-reference stays clean") {
    import spark.implicits._
    Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("k", "v")
      .createOrReplaceTempView("rs_base")
    // the view BODY aggregates (shuffle work); each SQL reference
    // re-expands it verbatim in the analyzed plan — the alias node is
    // exempt, but the walk must descend and flag the repeated Aggregate
    spark.sql("SELECT k, COUNT(*) AS n FROM rs_base GROUP BY k")
      .createOrReplaceTempView("rs_agg")
    val dup = spark.sql(
      "SELECT a.k, a.n, b.n AS n2 FROM rs_agg a JOIN rs_agg b ON a.k = b.k")
    assert(graft.util.PlanAudit.repeatedSubtrees(dup)
      .exists(f => f.node == "RepeatedSubtree" &&
        f.detail.contains("Aggregate")),
      "repeated shuffle fragment inside a twice-referenced view not flagged")
    // re-referencing a plain source view twice is a source re-read, not a
    // re-evaluated pipeline: no shuffle under the alias, no finding
    val srcDup = spark.sql(
      "SELECT a.k FROM rs_base a JOIN rs_base b ON a.k = b.k")
    assert(graft.util.PlanAudit.repeatedSubtrees(srcDup).isEmpty,
      "shuffle-free source re-reference must not flag")
  }

  test("similarity-maintenance and validation registry entries dispatch " +
      "correctly and reject bad options loudly") {
    import org.apache.spark.sql.functions.col
    import graft.config.TransformStep
    import graft.run.TransformFunctions
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    emb.createOrReplaceTempView("tf_emb")
    emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("centroid_id"), col("embedding"))
      .createOrReplaceTempView("tf_cents")
    emb.filter(col("vec_id") >= 4 && col("vec_id") < 9)
      .select(col("vec_id").as("centroid_id"), col("embedding"))
      .createOrReplaceTempView("tf_cents2")
    emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding"))
      .createOrReplaceTempView("tf_qs")
    val layout = tmpDir() + "/emb_by_cell"
    def step(fn: String, opts: (String, String)*) = TransformStep(
      functionName = fn, sqlQuery = "", outputDFName = fn + "_out",
      countValidation = None, options = opts.toMap)

    // build → stats frame reflects the written store
    val built = TransformFunctions.dispatch(spark,
      step("ivfBuildLayout", "input" -> "tf_emb", "centroids" -> "tf_cents",
        "path" -> layout)).head()
    val n = emb.count()
    assert(built.getAs[Long]("rows") == n && built.getAs[Long]("cells") == 4)
    // rebuild under NEW centroids: every row rewritten, new geometry
    val rebuilt = TransformFunctions.dispatch(spark,
      step("ivfRebuild", "centroids" -> "tf_cents2", "path" -> layout)).head()
    assert(rebuilt.getAs[Long]("rows_rewritten") == n)
    assert(rebuilt.getAs[Long]("cells") == 5)
    // probe the rebuilt store ≡ the inline ivfTopK under the same geometry
    val probed = TransformFunctions.dispatch(spark,
      step("ivfProbe", "input" -> "tf_qs", "centroids" -> "tf_cents2",
        "path" -> layout, "k" -> "5", "nprobe" -> "2"))
      .orderBy("q_id", "rank").collect().toSeq
    val inline = graft.x.Similarity.ivfTopK(emb,
        spark.table("tf_qs"), spark.table("tf_cents2"),
        "vec_id", "q_id", "centroid_id", "embedding", k = 5, nprobe = 2)
      .orderBy("q_id", "rank").collect().toSeq
    assert(probed == inline, "config-dispatched probe diverged from inline ivfTopK")

    // ivfAssign ≡ the direct call
    val assigned = TransformFunctions.dispatch(spark,
      step("ivfAssign", "input" -> "tf_qs", "idCol" -> "q_id",
        "centroids" -> "tf_cents2"))
      .orderBy("q_id").collect().toSeq
    val assignedDirect = graft.x.Similarity.assignToCentroids(
        spark.table("tf_qs"), spark.table("tf_cents2"),
        "q_id", "centroid_id", "embedding")
      .orderBy("q_id").collect().toSeq
    assert(assigned == assignedDirect && assigned.nonEmpty)
    // ivfAppend lands a batch in the store (the incremental-ingest
    // config path): the stats frame counts base + batch rows
    emb.select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      .limit(2).createOrReplaceTempView("tf_batch")
    val appended = TransformFunctions.dispatch(spark,
      step("ivfAppend", "input" -> "tf_batch", "centroids" -> "tf_cents2",
        "path" -> layout)).head()
    assert(appended.getAs[Long]("rows") == n + 2, s"append stats: $appended")

    // merkleDiff through the registry ≡ the direct Validations call
    spark.read.parquet(s"$sf/nation.parquet").createOrReplaceTempView("tf_a")
    spark.sql("SELECT n_nationkey, CASE WHEN n_nationkey = 3 THEN 'EDITED' " +
      "ELSE n_name END AS n_name FROM tf_a").createOrReplaceTempView("tf_b")
    val viaCfg = TransformFunctions.dispatch(spark,
      step("merkleDiff", "input" -> "tf_a", "against" -> "tf_b",
        "keyExpr" -> "cast(n_nationkey as string)",
        "rowExpr" -> "concat(cast(n_nationkey as string), '|', n_name)"))
      .orderBy("leaf").collect().toSeq
    import org.apache.spark.sql.functions.{concat, lit}
    val k = col("n_nationkey").cast("string")
    val direct = graft.operators.Validations.merkleDiff(
        graft.operators.Validations.merkleLeaves(
          spark.table("tf_a").select("n_nationkey", "n_name"),
          k, concat(k, lit("|"), col("n_name"))),
        graft.operators.Validations.merkleLeaves(
          spark.table("tf_b"), k, concat(k, lit("|"), col("n_name"))))
      .orderBy("leaf").collect().toSeq
    assert(viaCfg == direct && viaCfg.nonEmpty)
    // merkleDrill localizes the same injected edit to a level-2 leaf
    val drilled = TransformFunctions.dispatch(spark,
      step("merkleDrill", "input" -> "tf_a", "against" -> "tf_b",
        "keyExpr" -> "cast(n_nationkey as string)",
        "rowExpr" -> "concat(cast(n_nationkey as string), '|', n_name)",
        "levels" -> "2"))
    assert(drilled.count() == 1, "one edited key must drill to one leaf path")

    // a typo'd knob must fail naming the accepted keys, not run a default
    val typo = intercept[RuntimeException](TransformFunctions.dispatch(spark,
      step("psiDrift", "input" -> "tf_a", "against" -> "tf_b",
        "valueCol" -> "n_nationkey", "lo" -> "0", "hi" -> "30",
        "nbuckets" -> "10")))
    assert(typo.getMessage.contains("unknown options nbuckets"), typo.getMessage)
    // a missing required knob must fail loudly, not silently default
    val missing = intercept[RuntimeException](TransformFunctions.dispatch(spark,
      step("psiDrift", "input" -> "tf_a", "against" -> "tf_b",
        "valueCol" -> "n_nationkey", "lo" -> "0")))
    assert(missing.getMessage.contains("needs options.hi"), missing.getMessage)
  }

  test("pipeline step retries then surfaces the failure") {
    val bad = JobConfig.parse(
      """{"jobName": "boom",
        |"inputs": [{"dataFrameName": "nope", "format": "parquet", "path": "/nonexistent/path"}]
        |}""".stripMargin)
    val t0 = System.nanoTime()
    val e = intercept[IllegalStateException] {
      new PipelineRunner(spark).run(Seq(PipelineStep("boom", bad, retries = 2)))
    }
    assert(e.getMessage.contains("after 3 attempts"))
  }
}
