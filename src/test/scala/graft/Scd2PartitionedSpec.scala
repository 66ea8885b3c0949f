package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.config.SinkSpec
import graft.sinks.SinkWriter
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Partition-scoped SCD2 (SURVEY.md §4/§7.4): a batch must rewrite only
  * the bucket partitions its staged keys touch. */
class Scd2PartitionedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def partitionFiles(path: String): Map[String, Set[String]] =
    Files.list(Paths.get(path)).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("scd_bucket="))
      .map { p =>
        p.getFileName.toString ->
          Files.list(p).iterator().asScala.map(_.getFileName.toString)
            .filter(_.endsWith(".parquet")).toSet
      }.toMap

  test("second batch rewrites only touched bucket partitions (legacy layout)") {
    val path = Files.createTempDirectory("graft-scdp").toString + "/dim"
    val sink = SinkSpec("dim", loadType = "scdType2Insert", format = "parquet",
      path = Some(path), scdKeys = Seq("id"), scdTrackedCols = Seq("v"),
      options = Map("scdBuckets" -> "8", "scdVersioned" -> "false"))

    val snapshot = (1L to 200L).map(k => (k, s"v$k")).toDF("id", "v")
    SinkWriter.write(spark, snapshot, sink)
    val before = partitionFiles(path)
    assert(before.size == 8, s"expected 8 bucket partitions, got ${before.keySet}")

    // batch 2: mutate exactly one key → exactly one bucket partition changes
    val oneKey = Seq((7L, "CHANGED")).toDF("id", "v")
    SinkWriter.write(spark, oneKey, sink)
    val after = partitionFiles(path)

    val changed = after.keySet.filter(k => before(k) != after(k))
    assert(changed.size == 1, s"expected exactly one rewritten partition, got $changed")

    // correctness: key 7 has closed + current version; all other keys intact
    val dim = spark.read.parquet(path)
    assert(dim.count() == 201)
    val k7 = dim.filter($"id" === 7).orderBy("effective_from").collect()
    assert(k7.length == 2)
    assert(!k7(0).getAs[Boolean]("is_current") && k7(0).getAs[String]("v") == "v7")
    assert(k7(1).getAs[Boolean]("is_current") && k7(1).getAs[String]("v") == "CHANGED")
    assert(dim.filter($"is_current").count() == 200)
  }

  test("path-staged merge (scdStagingPath) is bit-equal and cleans its scratch") {
    val pLocal = Files.createTempDirectory("graft-scdp-l").toString + "/dim"
    val pStaged = Files.createTempDirectory("graft-scdp-s").toString + "/dim"
    val scratch = Files.createTempDirectory("graft-scdp-scratch").toString + "/stg"
    val mk = (p: String, opts: Map[String, String]) => SinkSpec("dim",
      loadType = "scdType2Insert", format = "parquet", path = Some(p),
      scdKeys = Seq("id"), scdTrackedCols = Seq("v"), options = opts)
    val b1 = (1L to 50L).map(k => (k, s"v$k")).toDF("id", "v")
    val b2 = (1L to 55L).map(k => (k, if (k % 3 == 0) s"w$k" else s"v$k")).toDF("id", "v")
    val legacy = Map("scdBuckets" -> "4", "scdVersioned" -> "false")
    SinkWriter.write(spark, b1, mk(pLocal, legacy))
    SinkWriter.write(spark, b2, mk(pLocal, legacy))
    SinkWriter.write(spark, b1, mk(pStaged, legacy + ("scdStagingPath" -> scratch)))
    SinkWriter.write(spark, b2, mk(pStaged, legacy + ("scdStagingPath" -> scratch)))
    val a = spark.read.parquet(pLocal).select("id", "v", "is_current")
    val b = spark.read.parquet(pStaged).select("id", "v", "is_current")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // the durable merge staging is scratch, removed once the overwrite lands
    assert(!Files.exists(Paths.get(scratch)),
      "staged merge scratch must be cleaned up after the overwrite commits")
  }

  test("scdVersioned: a crash mid-commit leaves ALL partitions old; the " +
      "published commit flips ALL touched partitions at once — never mixed") {
    import graft.sources.VersionedParquet
    val path = Files.createTempDirectory("graft-scdv").toString + "/dim"
    val sink = SinkSpec("dim", loadType = "scdType2Insert", format = "parquet",
      path = Some(path), scdKeys = Seq("id"), scdTrackedCols = Seq("v"),
      options = Map("scdBuckets" -> "8", "scdVersioned" -> "true"))
    val b1 = (1L to 200L).map(k => (k, s"v$k")).toDF("id", "v")
    SinkWriter.write(spark, b1, sink)
    val dim1 = VersionedParquet.read(spark, path)
    assert(dim1.count() == 200 && dim1.filter($"is_current").count() == 200)

    // batch 2 touches MANY buckets (every 10th key changes), then the
    // process dies after the data write, before the manifest publish
    val b2 = (1L to 200L).filter(_ % 10 == 0)
      .map(k => (k, s"CHANGED$k")).toDF("id", "v")
    val boom = intercept[RuntimeException] {
      SinkWriter.scd2InsertPartitioned(spark, b2, sink, nBuckets = 8,
        midCommitHook = () => throw new RuntimeException("injected crash"))
    }
    assert(boom.getMessage == "injected crash")
    // every partition still reads at the OLD version — no mixed state
    val afterCrash = VersionedParquet.read(spark, path)
    assert(afterCrash.count() == 200, "crash mid-commit must publish nothing")
    assert(afterCrash.filter($"v".startsWith("CHANGED")).count() == 0,
      "no partition may show the new version before the manifest lands")

    // the re-run converges: ONE commit flips every touched bucket together
    SinkWriter.write(spark, b2, sink)
    val healed = VersionedParquet.read(spark, path)
    assert(healed.count() == 220) // 200 current + 20 closed versions
    assert(healed.filter($"is_current" && $"v".startsWith("CHANGED")).count() == 20)
    assert(healed.filter($"is_current").count() == 200)
    // untouched keys' history is intact (carried files, not rewritten)
    assert(healed.filter($"id" === 7).count() == 1)
    // version history: init, the (only) successful merge — the crashed
    // attempt never became a version, only an unreferenced data dir
    assert(VersionedParquet.versions(path).size == 2,
      s"got versions ${VersionedParquet.versions(path)}")
    // time travel still sees the pre-merge snapshot whole
    val v0 = VersionedParquet.read(spark, path,
      Some(VersionedParquet.versions(path).min))
    assert(v0.count() == 200 && v0.filter($"v".startsWith("CHANGED")).count() == 0)
  }

  test("scdVersioned merge content matches the dynamic-overwrite path") {
    import graft.sources.VersionedParquet
    val pV = Files.createTempDirectory("graft-scdv-a").toString + "/dim"
    val pD = Files.createTempDirectory("graft-scdv-b").toString + "/dim"
    val mk = (p: String, opts: Map[String, String]) => SinkSpec("dim",
      loadType = "scdType2Insert", format = "parquet", path = Some(p),
      scdKeys = Seq("id"), scdTrackedCols = Seq("v"), options = opts)
    val b1 = (1L to 50L).map(k => (k, s"v$k")).toDF("id", "v")
    val b2 = (1L to 60L).map(k => (k, if (k % 5 == 0) s"w$k" else s"v$k")).toDF("id", "v")
    SinkWriter.write(spark, b1, mk(pV, Map("scdBuckets" -> "4", "scdVersioned" -> "true")))
    SinkWriter.write(spark, b2, mk(pV, Map("scdBuckets" -> "4", "scdVersioned" -> "true")))
    SinkWriter.write(spark, b1, mk(pD, Map("scdBuckets" -> "4", "scdVersioned" -> "false")))
    SinkWriter.write(spark, b2, mk(pD, Map("scdBuckets" -> "4", "scdVersioned" -> "false")))
    val a = VersionedParquet.read(spark, pV).select("id", "v", "is_current")
    val b = spark.read.parquet(pD).select("id", "v", "is_current")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("scdVersioned edge contracts: empty batch no-ops; stray partitions " +
      "in an overwritePartitions frame abort before publish") {
    import graft.sources.VersionedParquet
    val path = Files.createTempDirectory("graft-scdv-e").toString + "/dim"
    val sink = SinkSpec("dim", loadType = "scdType2Insert", format = "parquet",
      path = Some(path), scdKeys = Seq("id"), scdTrackedCols = Seq("v"),
      options = Map("scdBuckets" -> "4", "scdVersioned" -> "true"))
    SinkWriter.write(spark, (1L to 20L).map(k => (k, s"v$k")).toDF("id", "v"), sink)
    val v1 = VersionedParquet.versions(path).max
    // empty batch: no merge, no new version (dynamic path writes nothing too)
    SinkWriter.write(spark, Seq.empty[(Long, String)].toDF("id", "v"), sink)
    assert(VersionedParquet.versions(path).max == v1, "empty batch must not commit")
    assert(VersionedParquet.read(spark, path).count() == 20)
    // a frame carrying rows OUTSIDE `touched` would duplicate the carried
    // files of their partitions — must abort loudly, publishing nothing
    val dim = VersionedParquet.read(spark, path)
    val e = intercept[IllegalArgumentException] {
      VersionedParquet.overwritePartitions(dim, path, "scd_bucket",
        touched = Seq(dim.select("scd_bucket").head().getInt(0).toString))
    }
    assert(e.getMessage.contains("outside touched"), e.getMessage)
    assert(VersionedParquet.versions(path).max == v1, "stray-partition abort must not commit")
    assert(VersionedParquet.read(spark, path).count() == 20)
  }

  test("whole-snapshot compact refuses a partition-scoped table") {
    import graft.sources.VersionedParquet
    val path = Files.createTempDirectory("graft-scdv-c").toString + "/dim"
    val sink = SinkSpec("dim", loadType = "scdType2Insert", format = "parquet",
      path = Some(path), scdKeys = Seq("id"), scdTrackedCols = Seq("v"),
      options = Map("scdBuckets" -> "4", "scdVersioned" -> "true"))
    SinkWriter.write(spark, (1L to 40L).map(k => (k, s"v$k")).toDF("id", "v"), sink)
    // compacting would rewrite the snapshot into the flat layout and break
    // partition attribution for the NEXT partial commit — must refuse now
    val e = intercept[IllegalArgumentException](
      VersionedParquet.compact(spark, path, targetFiles = 1))
    assert(e.getMessage.contains("partition-scoped"), e.getMessage)
    // the table is untouched and still merges fine afterwards
    SinkWriter.write(spark, Seq((3L, "CHANGED")).toDF("id", "v"), sink)
    val dim = VersionedParquet.read(spark, path)
    assert(dim.filter($"is_current").count() == 40)
    assert(dim.filter($"v" === "CHANGED" && $"is_current").count() == 1)
  }

  test("partitioned and unpartitioned SCD2 agree on the merged content") {
    val p1 = Files.createTempDirectory("graft-scdp1").toString + "/dim"
    val p2 = Files.createTempDirectory("graft-scdp2").toString + "/dim"
    val mk = (p: String, opts: Map[String, String]) => SinkSpec("dim",
      loadType = "scdType2Insert", format = "parquet", path = Some(p),
      scdKeys = Seq("id"), scdTrackedCols = Seq("v"), options = opts)
    val b1 = (1L to 50L).map(k => (k, s"v$k")).toDF("id", "v")
    val b2 = (1L to 60L).map(k => (k, if (k % 5 == 0) s"w$k" else s"v$k")).toDF("id", "v")
    SinkWriter.write(spark, b1, mk(p1, Map("scdBuckets" -> "4", "scdVersioned" -> "false")))
    SinkWriter.write(spark, b2, mk(p1, Map("scdBuckets" -> "4", "scdVersioned" -> "false")))
    SinkWriter.write(spark, b1, mk(p2, Map.empty))
    SinkWriter.write(spark, b2, mk(p2, Map.empty))
    val a = spark.read.parquet(p1).select("id", "v", "is_current")
    val b = spark.read.parquet(p2).select("id", "v", "is_current")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("default flip (r14): a fresh partitioned sink gets the versioned " +
      "store; an existing legacy table stays on its raw-directory layout") {
    import graft.sources.VersionedParquet
    val mk = (p: String, opts: Map[String, String]) => SinkSpec("dim",
      loadType = "scdType2Insert", format = "parquet", path = Some(p),
      scdKeys = Seq("id"), scdTrackedCols = Seq("v"), options = opts)
    val b1 = (1L to 40L).map(k => (k, s"v$k")).toDF("id", "v")
    val b2 = Seq((3L, "CHANGED")).toDF("id", "v")

    // fresh table, no scdVersioned option → versioned store by default
    val pFresh = Files.createTempDirectory("graft-scddef").toString + "/dim"
    SinkWriter.write(spark, b1, mk(pFresh, Map("scdBuckets" -> "4")))
    assert(Files.exists(Paths.get(pFresh, "_graft_log")),
      "a fresh partitioned SCD2 sink must default to the versioned store")
    SinkWriter.write(spark, b2, mk(pFresh, Map("scdBuckets" -> "4")))
    val dim = VersionedParquet.read(spark, pFresh)
    assert(dim.filter($"is_current").count() == 40)
    assert(dim.filter($"v" === "CHANGED" && $"is_current").count() == 1)
    assert(VersionedParquet.versions(pFresh).size == 2)

    // pre-existing LEGACY table, no option → auto-detected, stays raw
    // (the flip must not orphan a deployment's raw-directory consumers)
    val pLegacy = Files.createTempDirectory("graft-scddef-l").toString + "/dim"
    SinkWriter.write(spark, b1,
      mk(pLegacy, Map("scdBuckets" -> "4", "scdVersioned" -> "false")))
    SinkWriter.write(spark, b2, mk(pLegacy, Map("scdBuckets" -> "4")))
    assert(!Files.exists(Paths.get(pLegacy, "_graft_log")),
      "an existing raw-layout table must keep merging in place")
    val legacyDim = spark.read.parquet(pLegacy)
    assert(legacyDim.filter($"is_current").count() == 40)
    assert(legacyDim.filter($"v" === "CHANGED" && $"is_current").count() == 1)

    // a typo'd scdVersioned value is a loud config error, not a default
    val boom = intercept[RuntimeException] {
      SinkWriter.write(spark, b2,
        mk(pFresh, Map("scdBuckets" -> "4", "scdVersioned" -> "yes")))
    }
    assert(boom.getMessage.contains("scdVersioned"), boom.getMessage)
  }

  test("empty FIRST batch must not initialize a zero-file versioned table") {
    import graft.sources.VersionedParquet
    val path = Files.createTempDirectory("graft-scdv-e0").toString + "/dim"
    val sink = SinkSpec("dim", loadType = "scdType2Insert", format = "parquet",
      path = Some(path), scdKeys = Seq("id"), scdTrackedCols = Seq("v"),
      options = Map("scdBuckets" -> "4"))
    SinkWriter.write(spark, Seq.empty[(Long, String)].toDF("id", "v"), sink)
    assert(VersionedParquet.versions(path).isEmpty,
      "an empty first batch must not commit a zero-file manifest")
    // the next real batch initializes normally (no empty-schema
    // readPartitions puzzle — ADVICE r13)
    SinkWriter.write(spark, (1L to 10L).map(k => (k, s"v$k")).toDF("id", "v"), sink)
    assert(VersionedParquet.read(spark, path).count() == 10)
  }
}
