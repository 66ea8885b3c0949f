package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SkewOps
import graft.x.Profiler

/** Skew diagnosis + mitigation contracts around the pre-existing
  * [[SkewOps]] (whose salted==plain equality lives in `SkewOpsSpec`):
  * the hot key must actually SPREAD, and the keySkew diagnostic that
  * picks the salt factor must be exact. */
class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sfDir

  test("salting actually spreads a hot key over the salt space") {
    import spark.implicits._
    // one key carries 800 of 810 rows — the straggler shape
    val big = ((1 to 800).map(i => (1L, i.toLong)) ++
      (1 to 10).map(i => (2L, 1000L + i))).toDF("k", "id")
    val small = Seq((1L, "hot"), (2L, "cold")).toDF("k", "v")
    // the content-derived salt SkewOps applies: spread of the hot key
    val shards = big.withColumn("__salt",
        pmod(xxhash64(col("k"), col("id")), lit(8)))
      .filter(col("k") === 1L)
      .groupBy("__salt").count().collect().map(_.getLong(1))
    assert(shards.length == 8, s"hot key hit only ${shards.length}/8 shards")
    assert(shards.max <= 800 / 8 * 2, s"worst shard ${shards.max} of 800")
    // and the join result still matches the plain join
    val salted = SkewOps.saltedJoin(big, small, Seq("k"), saltFactor = 8)
    assert(salted.count() == 810)
  }

  test("AQE splits the skewed partition of an UNSALTED sort-merge join " +
      "(OptimizeSkewedJoin) — salting is only for what AQE can't see") {
    import spark.implicits._
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    // When the skewed join IS a sort-merge join AQE observes at runtime,
    // the right tool is no tool: OptimizeSkewedJoin splits the fat
    // partition into advisory-sized slices and replicates the matching
    // build rows. SkewOps.saltedJoin earns its replication cost only where
    // AQE can't act — broadcast-ineligible plans it can't split (stream
    // side of an outer join it must preserve), or a skewed AGGREGATION
    // (saltedAgg), which AQE never rewrites.
    val keep = Seq(
      "spark.sql.adaptive.enabled", "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // test-sized detection bars (defaults are 256 MB / 5×median)
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16k")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8k")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val pad = "x" * 256
      // key 1 carries 50k of 55k rows: one shuffle partition dwarfs the rest
      val large = spark.range(0, 55000).select(
        when($"id" < 50000, lit(1L)).otherwise(pmod($"id", lit(100)) + 2L).as("k"),
        concat(lit(pad), $"id".cast("string")).as("payload"))
      val small = spark.range(0, 200).select($"id".as("k"),
        concat(lit(pad), $"id".cast("string")).as("v"))
      val agg = large.join(small, Seq("k"))
        .agg(sum(length($"payload")).as("s"))
      agg.collect()
      // materialized query stages are leaf nodes, so render the final
      // adaptive plan and assert on SortMergeJoin's skew=true marker
      val finalPlan = (agg.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }).toString
      assert(finalPlan.contains("SortMergeJoin"),
        s"expected a sort-merge join:\n$finalPlan")
      assert(finalPlan.contains("skew=true"),
        s"OptimizeSkewedJoin did not fire on the hot key:\n$finalPlan")
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("merkleDiff: identical tables diff empty; edits localize to their leaves") {
    import graft.operators.Validations
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val key = concat(col("l_orderkey").cast("string"), lit("|"),
      col("l_linenumber").cast("string"))
    def row = concat(key, lit("|"),
      col("l_quantity").cast("decimal(18,2)").cast("string"))
    val base = Validations.merkleLeaves(li, key, row)
    assert(Validations.merkleDiff(base, base).count() == 0)
    // fixture (l_orderkey, l_linenumber) is NOT unique — pick a key pair
    // that identifies exactly one row so the edit provably lands
    val solo = li.groupBy("l_orderkey", "l_linenumber").count()
      .filter(col("count") === 1).orderBy("l_orderkey", "l_linenumber").head()
    val (ok, ln) = (solo.getLong(0), solo.getInt(1))
    val hit = col("l_orderkey") === ok && col("l_linenumber") === ln
    // one edited row → exactly one differing leaf, same counts both sides
    val edited = li.withColumn("l_quantity",
      when(hit, col("l_quantity") + 1.0).otherwise(col("l_quantity")))
    val diff = Validations.merkleDiff(base,
      Validations.merkleLeaves(edited, key, row)).collect()
    assert(diff.length == 1)
    assert(diff.head.getAs[Long]("a_cnt") == diff.head.getAs[Long]("b_cnt"))
    // a dropped row surfaces as a count mismatch in its leaf
    val dropDiff = Validations.merkleDiff(base,
      Validations.merkleLeaves(li.filter(!hit), key, row)).collect()
    assert(dropDiff.length == 1)
    assert(dropDiff.head.getAs[Long]("a_cnt") ==
      dropDiff.head.getAs[Long]("b_cnt") + 1)
  }

  test("merkleDrill: edits localize to <=3 second-level leaves; drill " +
      "filter and full-rescan fallback agree") {
    import graft.operators.Validations
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val key = concat(col("l_orderkey").cast("string"), lit("|"),
      col("l_linenumber").cast("string"))
    def row = concat(key, lit("|"),
      col("l_quantity").cast("decimal(18,2)").cast("string"))
    val edited = li.withColumn("l_quantity",
      when(col("l_orderkey").isin(1L, 7L, 42L) && col("l_linenumber") === 1,
        col("l_quantity") + 1.0).otherwise(col("l_quantity")))
    val drill = Validations.merkleDrill(li, edited, key, row, levels = 2)
      .orderBy("leaf_1", "leaf_2").collect()
    // 3 edited keys → at most 3 differing 1/65,536 ranges (fewer only on
    // a path collision), every one an edit (equal counts both sides)
    assert(drill.nonEmpty && drill.length <= 3, s"got ${drill.length} leaves")
    drill.foreach { r =>
      assert(r.getAs[Long]("a_cnt") == r.getAs[Long]("b_cnt"))
      assert(r.getAs[Long]("leaf_1") < 256 && r.getAs[Long]("leaf_2") < 256)
    }
    // each differing level-2 path sits under a differing level-1 leaf
    val l1 = Validations.merkleDrill(li, edited, key, row, levels = 1)
      .collect().map(_.getAs[Long]("leaf_1")).toSet
    assert(drill.map(_.getAs[Long]("leaf_1")).toSet.subsetOf(l1))
    // maxDrillPaths=0 disables the hot-parent filter (full finer re-scan):
    // the answer must be identical, only the IO differs
    val full = Validations.merkleDrill(li, edited, key, row, levels = 2,
      maxDrillPaths = 0).orderBy("leaf_1", "leaf_2").collect()
    assert(full.toSeq == drill.toSeq)
    // identical tables drill to an empty diff
    assert(Validations.merkleDrill(li, li, key, row, levels = 2).count() == 0)
  }

  test("keySkew is exact on a hand-checked frame") {
    import spark.implicits._
    // k: a×4, b×2, c,d,e,f ×1 → n=10, nd=6, mx=4,
    // hhi = (16+4+1+1+1+1)/100 = 0.24, skew_ratio = 4*6/10 = 2.4
    val df = (Seq.fill(4)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d", "e", "f"))
      .toDF("k")
    val r = Profiler.keySkew(df, Seq("k")).head()
    assert(r.getAs[Long]("n") == 10L)
    assert(r.getAs[Long]("n_distinct") == 6L)
    assert(r.getAs[String]("top_key") == "a")
    assert(r.getAs[Double]("top_share") == 0.4)
    assert(r.getAs[Double]("hhi") == 0.24)
    assert(r.getAs[Double]("skew_ratio") == 2.4)
  }
}
