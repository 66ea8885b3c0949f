package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.IncrementalAgg
import graft.sources.VersionedParquet

class IncrementalAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp() = java.nio.file.Files.createTempDirectory("graft-inc").toString

  private def stateMap(statePath: String): Map[Long, (Long, Long)] =
    VersionedParquet.read(spark, statePath)
      .select("k", "cnt", "sum_v").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("delta refresh over appends matches the batch aggregate") {
    val base = tmp(); val src = s"$base/s"; val st = s"$base/t"
    VersionedParquet.write(Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("k", "v"), src, "overwrite")
    assert(IncrementalAgg.refresh(spark, src, st, Seq("k"), Seq("v")) === 0L)
    assert(stateMap(st) === Map(1L -> ((2L, 30L)), 2L -> ((1L, 5L))))

    VersionedParquet.write(Seq((2L, 7L), (3L, 1L)).toDF("k", "v"), src, "append")
    IncrementalAgg.refresh(spark, src, st, Seq("k"), Seq("v"))
    assert(stateMap(st) === Map(1L -> ((2L, 30L)), 2L -> ((2L, 12L)), 3L -> ((1L, 1L))))
  }

  test("overwrite retracts old contributions and drops emptied groups") {
    val base = tmp(); val src = s"$base/s"; val st = s"$base/t"
    VersionedParquet.write(Seq((1L, 10L), (2L, 5L)).toDF("k", "v"), src, "overwrite")
    IncrementalAgg.refresh(spark, src, st, Seq("k"), Seq("v"))
    // group 2 disappears entirely; group 1 changes value
    VersionedParquet.write(Seq((1L, 99L)).toDF("k", "v"), src, "overwrite")
    IncrementalAgg.refresh(spark, src, st, Seq("k"), Seq("v"))
    assert(stateMap(st) === Map(1L -> ((1L, 99L))))
  }

  test("refresh is a no-op when current and resumes after catching up") {
    val base = tmp(); val src = s"$base/s"; val st = s"$base/t"
    VersionedParquet.write(Seq((1L, 1L)).toDF("k", "v"), src, "overwrite")
    val v0 = IncrementalAgg.refresh(spark, src, st, Seq("k"), Seq("v"))
    val versionsBefore = VersionedParquet.versions(st)
    // no new source commits: watermark unchanged, no state commit written
    assert(IncrementalAgg.refresh(spark, src, st, Seq("k"), Seq("v")) === v0)
    assert(VersionedParquet.versions(st) === versionsBefore)
    // two source commits, ONE refresh: delta spans both
    VersionedParquet.write(Seq((1L, 2L)).toDF("k", "v"), src, "append")
    VersionedParquet.write(Seq((2L, 3L)).toDF("k", "v"), src, "append")
    IncrementalAgg.refresh(spark, src, st, Seq("k"), Seq("v"))
    assert(stateMap(st) === Map(1L -> ((2L, 3L)), 2L -> ((1L, 3L))))
  }

  test("watermark rides the commit manifest (no scan); pre-metadata states fall back to rows") {
    val base = tmp(); val src = s"$base/s"; val st = s"$base/t"
    VersionedParquet.write(Seq((1L, 1L)).toDF("k", "v"), src, "overwrite")
    VersionedParquet.write(Seq((2L, 2L)).toDF("k", "v"), src, "append")
    IncrementalAgg.refresh(spark, src, st, Seq("k"), Seq("v"))
    // the mark is in the manifest metadata, atomically with the state
    val stV = VersionedParquet.versions(st).max
    assert(VersionedParquet.commitMeta(st, stV) ===
      Map(IncrementalAgg.SrcVersion -> "1"))
    assert(IncrementalAgg.watermark(spark, st) === 1L)
    // a state written WITHOUT metadata (pre-upgrade layout) still resolves
    // through the _src_version rows — and the next refresh re-publishes meta
    val rows = VersionedParquet.read(spark, st)
    VersionedParquet.write(rows, st, "overwrite") // meta-less commit
    assert(VersionedParquet.commitMeta(st, VersionedParquet.versions(st).max) === Map.empty)
    assert(IncrementalAgg.watermark(spark, st) === 1L, "row fallback")
    VersionedParquet.write(Seq((3L, 3L)).toDF("k", "v"), src, "append")
    IncrementalAgg.refresh(spark, src, st, Seq("k"), Seq("v"))
    assert(VersionedParquet.commitMeta(st, VersionedParquet.versions(st).max) ===
      Map(IncrementalAgg.SrcVersion -> "2"))
    assert(stateMap(st) === Map(1L -> ((1L, 1L)), 2L -> ((1L, 2L)), 3L -> ((1L, 3L))))
  }

  test("incrementalAggInsert load type folds each written batch into the state") {
    val base = tmp(); val st = s"$base/t"
    val sink = graft.config.SinkSpec(dataFrameName = "agg", loadType = "incrementalAggInsert",
      path = Some(st), options = Map("aggKeys" -> "k", "aggSumCols" -> "v"))
    graft.sinks.SinkWriter.write(spark, Seq((1L, 10L), (2L, 5L)).toDF("k", "v"), sink)
    graft.sinks.SinkWriter.write(spark, Seq((1L, 1L), (3L, 2L)).toDF("k", "v"), sink)
    assert(stateMap(st) === Map(1L -> ((2L, 11L)), 2L -> ((1L, 5L)), 3L -> ((1L, 2L))))
  }

  test("streaming foreachBatch maintains the aggregate across micro-batches") {
    val base = tmp(); val in = s"$base/in"; val st = s"$base/t"; val cp = s"$base/cp"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    Seq((1L, 10L), (2L, 5L)).toDF("k", "v").coalesce(1)
      .write.mode("append").parquet(in)
    val schema = "k LONG, v LONG"
    val sink = graft.config.SinkSpec(dataFrameName = "agg", loadType = "incrementalAggInsert",
      path = Some(st), options = Map("aggKeys" -> "k", "aggSumCols" -> "v"))
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(in)
      val q = graft.streaming.StreamingJobs.startForeachBatch(stream, sink, cp)
      q.processAllAvailable(); q.stop()
    }
    runOnce()
    assert(stateMap(st) === Map(1L -> ((1L, 10L)), 2L -> ((1L, 5L))))
    // second file arrives; the checkpoint makes replay start after batch 0
    Seq((1L, 7L)).toDF("k", "v").coalesce(1).write.mode("append").parquet(in)
    runOnce()
    assert(stateMap(st) === Map(1L -> ((2L, 17L)), 2L -> ((1L, 5L))))
  }

  test("upsert replaces matched keys, inserts new ones, keeps the rest") {
    val base = tmp(); val dim = s"$base/d"
    graft.operators.Upsert.upsert(spark,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), dim, Seq("k"))
    graft.operators.Upsert.upsert(spark,
      Seq((2L, "B"), (9L, "i")).toDF("k", "v"), dim, Seq("k"))
    val out = VersionedParquet.read(spark, dim).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out === Seq((1L, "a"), (2L, "B"), (3L, "c"), (9L, "i")))
    // re-running the same batch converges (table-level idempotence)
    graft.operators.Upsert.upsert(spark,
      Seq((2L, "B"), (9L, "i")).toDF("k", "v"), dim, Seq("k"))
    assert(VersionedParquet.read(spark, dim).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq === out)
    // and history is queryable: version 0 still shows the seed
    val v0 = VersionedParquet.versions(dim).head
    assert(VersionedParquet.read(spark, dim, Some(v0)).count() === 3)
  }

  test("upsert NULL business keys are values, not orphans (Scd2 key contract)") {
    val base = tmp(); val dim = s"$base/d"
    graft.operators.Upsert.upsert(spark,
      Seq((Some(1L), "a"), (None, "n0")).toDF("k", "v"), dim, Seq("k"))
    // the NULL-keyed batch row must REPLACE the NULL-keyed current row;
    // an equi anti-join never matches NULL to NULL and would keep both
    graft.operators.Upsert.upsert(spark,
      Seq((Option.empty[Long], "n1")).toDF("k", "v"), dim, Seq("k"))
    val out = VersionedParquet.read(spark, dim)
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)), r.getString(1)))
      .toSet
    assert(out === Set((Some(1L), "a"), (None, "n1")))
  }

  test("refresh folds NULL-keyed groups into their prior state (null-safe combine)") {
    val base = tmp(); val src = s"$base/s"; val st = s"$base/t"
    VersionedParquet.write(
      Seq((Some(1L), 10L), (None, 5L)).toDF("k", "v"), src, "overwrite")
    IncrementalAgg.refresh(spark, src, st, Seq("k"), Seq("v"))
    VersionedParquet.write(
      Seq((Option.empty[Long], 7L)).toDF("k", "v"), src, "append")
    IncrementalAgg.refresh(spark, src, st, Seq("k"), Seq("v"))
    val rows = VersionedParquet.read(spark, st)
      .select("k", "cnt", "sum_v").collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getLong(1), r.getLong(2))).toSet
    // exactly ONE row for the NULL group, with the delta folded in — not
    // one partial NULL row per refresh
    assert(rows === Set((Some(1L), 1L, 10L), (None, 2L, 12L)))
  }

  test("upsertInsert load type routes through SinkWriter with scdKeys") {
    val base = tmp(); val dim = s"$base/d"
    val sink = graft.config.SinkSpec(dataFrameName = "dim", loadType = "upsertInsert",
      path = Some(dim), scdKeys = Seq("k"))
    graft.sinks.SinkWriter.write(spark, Seq((1L, "a")).toDF("k", "v"), sink)
    graft.sinks.SinkWriter.write(spark, Seq((1L, "A"), (2L, "b")).toDF("k", "v"), sink)
    assert(VersionedParquet.read(spark, dim).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "A"), (2L, "b")))
  }

  test("state is itself versioned: time travel shows each refresh") {
    val base = tmp(); val src = s"$base/s"; val st = s"$base/t"
    VersionedParquet.write(Seq((1L, 1L)).toDF("k", "v"), src, "overwrite")
    IncrementalAgg.refresh(spark, src, st, Seq("k"), Seq("v"))
    VersionedParquet.write(Seq((1L, 9L)).toDF("k", "v"), src, "append")
    IncrementalAgg.refresh(spark, src, st, Seq("k"), Seq("v"))
    val vs = VersionedParquet.versions(st)
    assert(vs.size === 2)
    val first = VersionedParquet.read(spark, st, Some(vs.head))
      .select("cnt", "sum_v").head()
    assert((first.getLong(0), first.getLong(1)) === ((1L, 1L)))
  }

  test("deltaJoinAppend: old view + delta is bag-identical to full recompute") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sfDir
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val l = spark.read.parquet(s"$sf/lineitem.parquet")
    val aNew = o.filter(pmod(col("o_orderkey"), lit(7)) === 0)
    val aOld = o.filter(pmod(col("o_orderkey"), lit(7)) =!= 0)
    val bNew = l.filter(col("l_linenumber") >= 5)
    val bOld = l.filter(col("l_linenumber") < 5)
    val proj = Seq("o_orderkey", "l_linenumber", "l_quantity").map(col)
    val oldView = aOld.join(bOld, aOld("o_orderkey") === bOld("l_orderkey"))
      .select(proj: _*)
    val delta = graft.operators.IncrementalJoin
      .deltaJoinAppend(aOld, aNew, bOld, bNew, "o_orderkey", "l_orderkey")
      .select(proj: _*)
    val full = o.join(l, o("o_orderkey") === l("l_orderkey")).select(proj: _*)
    // bag equality via keyed multiplicity counts (exceptAll both ways is
    // two extra shuffles; count-compare is one)
    val got = oldView.unionByName(delta).groupBy(proj: _*).count()
    val want = full.groupBy(proj: _*).count()
    val diff = got.join(want, Seq("o_orderkey", "l_linenumber", "l_quantity"),
        "full_outer")
      .filter(not(got("count") <=> want("count")))
    assert(diff.count() === 0)
    assert(delta.count() > 0, "fixture split must produce a non-empty delta")
  }
}
