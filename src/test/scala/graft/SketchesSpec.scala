package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.x.Sketches

/** HLL + count-min contracts: estimator accuracy in its design regime,
  * CMS's one-sided error, and the mergeability both sketches exist for. */
class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sfDir

  test("hllDistinct lands within the m=256 error envelope in its regime") {
    import spark.implicits._
    // n >> m so the raw (uncorrected) estimator is in its design regime:
    // 6000 distinct keys vs 256 registers; typical error 1.04/sqrt(256)
    // ≈ 6.5%, assert a generous 4-sigma band
    val df = (1 to 6000).map(i => ("g", s"key$i")).toDF("g", "k")
    val row = Sketches.hllDistinct(df, Seq("g"), "k", b = 8).head()
    val est = row.getAs[Double]("est")
    assert(math.abs(est - 6000.0) / 6000.0 < 0.26, s"est $est vs 6000")
    assert(row.getAs[Long]("v_zero") == 0L)
  }

  test("hllDistinct is layout-invariant (same registers under any partitioning)") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val a = Sketches.hllDistinct(li, Seq("l_returnflag"), "l_partkey")
      .orderBy("l_returnflag").collect().toSeq
    val b = Sketches.hllDistinct(li.repartition(7), Seq("l_returnflag"), "l_partkey")
      .orderBy("l_returnflag").collect().toSeq
    assert(a == b)
  }

  test("cms estimates are >= true counts and exact for heavy keys here") {
    import spark.implicits._
    val ev = graft.sources.SourceReader.readEvents(spark, s"$sf/events.parquet")
    val sketch = Sketches.cmsBuild(ev, "user_id")
    val truth = ev.groupBy("user_id").agg(count(lit(1)).as("true_cnt"))
    val probes = truth.orderBy(col("true_cnt").desc, col("user_id")).limit(20)
    val got = Sketches.cmsEstimate(sketch, probes, "user_id")
      .join(probes, Seq("user_id"))
      .select(col("user_id"), col("est"), col("true_cnt"))
      .collect()
    // sf0.001 has fewer than 20 distinct users; every probe must resolve
    assert(got.length == probes.count())
    assert(got.nonEmpty)
    got.foreach { r =>
      val (est, t) = (r.getLong(1), r.getLong(2))
      assert(est >= t, s"CMS must never underestimate: $est < $t")
      // 1000 events over 4x256 counters: collision overshoot stays small
      assert(est <= t + 100, s"implausible overshoot $est vs $t")
    }
  }

  test("cmsJoinSizeEstimate: upper bound, exact on tiny vocab, zero on disjoint keys") {
    import spark.implicits._
    // tiny vocab (4 keys in 4x256 cells): collisions are absent, so the
    // inner-product estimate must be EXACTLY the true join size
    val a = Seq("k1", "k1", "k1", "k2", "k2", "k3").toDF("k")
    val b = Seq("k1", "k2", "k2", "k2", "k4").toDF("k")
    val ska = Sketches.cmsBuild(a, "k")
    val skb = Sketches.cmsBuild(b, "k")
    val est = Sketches.cmsJoinSizeEstimate(ska, skb).head().getLong(0)
    assert(est == 3L * 1 + 2L * 3, s"collision-free estimate must be exact, got $est")
    // self-join estimate >= exact degree-squared sum (upper-bound law)
    val ev = graft.sources.SourceReader.readEvents(spark, s"$sf/events.parquet")
    val sk = Sketches.cmsBuild(ev, "user_id")
    val selfEst = Sketches.cmsJoinSizeEstimate(sk, sk).head().getLong(0)
    val exact = ev.groupBy("user_id").agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * col("c"))).head().getLong(0)
    assert(selfEst >= exact, s"CMS join size must never underestimate: $selfEst < $exact")
    // disjoint key sets answer 0 even when a depth row has no shared cells
    val skc = Sketches.cmsBuild(Seq("z9", "z8").toDF("k"), "k")
    assert(Sketches.cmsJoinSizeEstimate(ska, skc).head().getLong(0) == 0L)
  }

  test("per-day HLL registers merged by max equal the direct sketch") {
    // events reads go through the schema-adaptive seam (SKILL.md): a raw
    // parquet read of a NANOS-era fixture would cast nanos-as-seconds here
    val ev = graft.sources.SourceReader.readEvents(spark, s"$sf/events.parquet")
      .withColumn("day", to_date(col("ts")))
    val daily = Sketches.hllRegisters(ev, Seq("event_type", "day"), "user_id")
    val merged = daily.groupBy(col("event_type"), col("__j"))
      .agg(max(col("__mj")).as("__mj"))
    val viaMerge = Sketches.hllEstimateFromRegisters(merged, Seq("event_type"))
      .orderBy("event_type").collect().toSeq
    val direct = Sketches.hllDistinct(ev, Seq("event_type"), "user_id")
      .orderBy("event_type").collect().toSeq
    assert(viaMerge == direct)
  }

  test("cms probe of an unseen key answers est=0 (or its collision bound), never drops") {
    import spark.implicits._
    // tiny sketch: 3 occurrences of one key; most counters stay empty
    val sketch = Sketches.cmsBuild(Seq("a", "a", "a").toDF("k"), "k")
    val got = Sketches.cmsEstimate(sketch,
        Seq("a", "never-seen-1", "never-seen-2").toDF("k"), "k")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set("a", "never-seen-1", "never-seen-2"),
      s"unseen probe keys must not vanish: $got")
    assert(got("a") == 3L)
    // an unseen key hits >= 1 empty counter out of 4x256 with these sizes,
    // so the min-including-zeros answer is exactly 0
    assert(got("never-seen-1") == 0L && got("never-seen-2") == 0L, s"$got")
  }

  test("cms counter matrices merge by cell-wise re-aggregation") {
    import spark.implicits._
    val ev = graft.sources.SourceReader.readEvents(spark, s"$sf/events.parquet")
    val full = Sketches.cmsBuild(ev, "user_id")
    val lo = Sketches.cmsBuild(ev.filter(col("event_id") % 2 === 0), "user_id")
    val hi = Sketches.cmsBuild(ev.filter(col("event_id") % 2 === 1), "user_id")
    val merged = lo.unionByName(hi).groupBy("i", "c").agg(sum("cnt").as("cnt"))
    val diff = merged.join(full, Seq("i", "c"), "full_outer")
      .filter(not(merged("cnt") <=> full("cnt")))
    assert(diff.count() == 0)
  }

  test("bitmap words: exact distinct, lossless merge, exact intersection") {
    import spark.implicits._
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val words = Sketches.bitmapWords(li, Seq("l_returnflag"), "l_partkey")
    // exact distinct per group, any id distribution
    val got = Sketches.bitmapDistinct(words, Seq("l_returnflag"))
      .select("l_returnflag", "distinct_cnt").as[(String, Long)].collect().toMap
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("e")).as[(String, Long)].collect().toMap
    assert(got == exact)
    // split the input, build per-half stores, bit_or-merge: identical words
    val lo = Sketches.bitmapWords(li.filter(col("l_orderkey") % 2 === 0),
      Seq("l_returnflag"), "l_partkey")
    val hi = Sketches.bitmapWords(li.filter(col("l_orderkey") % 2 === 1),
      Seq("l_returnflag"), "l_partkey")
    val merged = Sketches.bitmapMerge(lo.unionByName(hi), Seq("l_returnflag"))
    val wordDiff = merged.join(words, Seq("l_returnflag", "__w"), "full_outer")
      .filter(not(merged("__bits") <=> words("__bits")))
    assert(wordDiff.count() == 0)
    // intersection popcount equals the join-based distinct overlap
    val a = Sketches.bitmapWords(li.filter(col("l_returnflag") === "A")
      .withColumn("g", lit(1)), Seq("g"), "l_partkey")
    val b = Sketches.bitmapWords(li.filter(col("l_returnflag") === "R")
      .withColumn("g", lit(1)), Seq("g"), "l_partkey")
    val overlap = Sketches.bitmapIntersect(a, b, Seq("g"), Seq("g"))
      .select("overlap_cnt").as[Long].head()
    val exactOverlap = li.filter(col("l_returnflag") === "A")
      .select("l_partkey").distinct()
      .intersect(li.filter(col("l_returnflag") === "R")
        .select("l_partkey").distinct()).count()
    assert(overlap == exactOverlap, s"$overlap vs $exactOverlap")
    // negative ids are excluded by contract, never folded into a word
    val neg = Sketches.bitmapWords(
      Seq(-1L, 0L, 63L, 64L).toDF("id").withColumn("g", lit(1)), Seq("g"), "id")
    assert(Sketches.bitmapDistinct(neg, Seq("g"))
      .select("distinct_cnt").as[Long].head() == 3L)
  }

  test("hdr quantiles: ≤2^-p relative error vs exact, lossless store merge") {
    import spark.implicits._
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .withColumn("v", floor(col("l_extendedprice")))
    val p = 5
    val hist = Sketches.hdrHistogram(li, Seq("l_returnflag"), "v", p)
    val got = Sketches.hdrQuantiles(hist, Seq("l_returnflag"),
        Seq("0.5", "0.9", "0.99"), p)
      .select("l_returnflag", "q", "q_value")
      .as[(String, String, Long)].collect()
    // exact discrete percentiles (same ⌈q·n⌉ rank convention)
    val exact = li.groupBy("l_returnflag")
      .agg(expr("percentile(v, array(0.5, 0.9, 0.99))").as("ps"))
      .as[(String, Seq[Double])].collect()
      .map { case (g, ps) => g -> ps }.toMap
    val qIdx = Map("0.5" -> 0, "0.9" -> 1, "0.99" -> 2)
    got.foreach { case (g, q, lb) =>
      val ex = exact(g)(qIdx(q))
      // sketch answers the bucket lower bound: lb ≤ true < lb·(1+2^-p)
      // (percentile() interpolates, so allow the bound on either side)
      assert(lb <= ex * (1 + math.pow(2.0, -p)) + 1,
        s"$g q=$q: lb $lb above exact $ex")
      assert(ex <= (lb + 1) * (1 + math.pow(2.0, -p)) + 1,
        s"$g q=$q: exact $ex above bucket range of $lb")
    }
    // CDF lookup: monotone in v, max value maps to exactly 1.0
    val cdf = Sketches.hdrCdf(hist, li, Seq("l_returnflag"), "v", p)
    import spark.implicits._
    val byV = cdf.filter(col("l_returnflag") === "A")
      .select("__v", "cdf").distinct().as[(Long, Double)].collect().sortBy(_._1)
    assert(byV.sliding(2).forall(w => w.length < 2 || w(0)._2 <= w(1)._2),
      "cdf must be monotone in value")
    assert(math.abs(byV.last._2 - 1.0) < 1e-12, s"max cdf ${byV.last}")
    assert(byV.head._2 > 0.0)
    // per-half histograms merged by count-sum equal the direct histogram
    val lo = Sketches.hdrHistogram(li.filter(col("l_orderkey") % 2 === 0),
      Seq("l_returnflag"), "v", p)
    val hi = Sketches.hdrHistogram(li.filter(col("l_orderkey") % 2 === 1),
      Seq("l_returnflag"), "v", p)
    val merged = Sketches.hdrMerge(lo.unionByName(hi), Seq("l_returnflag"))
    val diff = merged.join(hist, Seq("l_returnflag", "__b"), "full_outer")
      .filter(not(merged("__cnt") <=> hist("__cnt")))
    assert(diff.count() == 0)
  }
}
