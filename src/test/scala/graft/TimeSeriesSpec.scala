package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.x.{EventAnalytics, Profiler}

/** EWMA decay, linear interpolation, OLS trend: hand-computed references
  * plus the layout-invariance assertion the exact-arithmetic design
  * promises. */
class TimeSeriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(day: Int, v: Double) =
    (f"2024-01-$day%02d 12:00:00", "s", v)

  test("ewmaDaily: binary decay over the trailing window, bit-exact") {
    val events = Seq(ev(1, 8.0), ev(2, 4.0), ev(4, 2.0))
      .toDF("ts", "series", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    val got = EventAnalytics.ewmaDaily(events, "ts", "series", "value", windowDays = 30)
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(got("2024-01-01") == 8.0)
    assert(got("2024-01-02") == 4.0 + 8.0 / 2)             // 8.0
    assert(got("2024-01-04") == 2.0 + 4.0 / 4 + 8.0 / 8)   // 4.0
    // layout invariance: same result from a 13-partition scramble
    val got2 = EventAnalytics.ewmaDaily(events.repartition(13), "ts", "series",
      "value", windowDays = 30)
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(got2 == got)
  }

  test("ewmaDaily: observations older than the window fall out") {
    val events = Seq(ev(1, 1024.0), ev(5, 1.0)).toDF("ts", "series", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    val got = EventAnalytics.ewmaDaily(events, "ts", "series", "value", windowDays = 2)
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(got("2024-01-05") == 1.0) // day 1 is 4 days back, window is 2
  }

  test("interpolateDaily reconstructs gradual change; endpoints exact") {
    val events = Seq(ev(1, 10.0), ev(4, 16.0), ev(5, 2.0))
      .toDF("ts", "series", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    val rows = EventAnalytics.interpolateDaily(events, "ts", "series", "value")
      .collect().map(r => (r.getString(1), r.getDouble(2), r.getBoolean(3)))
    assert(rows.toSet == Set(
      ("2024-01-01", 10.0, false),
      ("2024-01-02", 12.0, true),
      ("2024-01-03", 14.0, true),
      ("2024-01-04", 16.0, false),
      ("2024-01-05", 2.0, false)))
  }

  test("ols2 recovers planted coefficients; degenerate groups yield NULLs") {
    // y = 7 + 3*x1 - 2*x2 exactly (integer lattice, zero residual)
    val pts = for (x1 <- 0L to 9L; x2 <- 0L to 9L)
      yield ("g", x1, x2, 7L + 3L * x1 - 2L * x2)
    // collinear group: x2 = 2*x1 -> det = 0 -> NULL coefficients
    val bad = (0L to 9L).map(i => ("c", i, 2L * i, 5L + i))
    val df = (pts ++ bad).toDF("g", "x1", "x2", "y")
    val rows = Profiler.ols2(df, "x1", "x2", "y", Seq("g"))
      .collect().map(r => r.getString(0) -> r).toMap
    val good = rows("g")
    assert(good.getLong(1) === 100L)
    assert(math.abs(good.getDouble(2) - 7.0) < 1e-6, s"b0 ${good.getDouble(2)}")
    assert(math.abs(good.getDouble(3) - 3.0) < 1e-6, s"b1 ${good.getDouble(3)}")
    assert(math.abs(good.getDouble(4) - (-2.0)) < 1e-6, s"b2 ${good.getDouble(4)}")
    assert(math.abs(good.getDouble(5) - 1.0) < 1e-6, s"r2 ${good.getDouble(5)}")
    assert(rows("c").isNullAt(2) && rows("c").isNullAt(3) && rows("c").isNullAt(4),
      "collinear group must yield NULL coefficients, not garbage")
    // layout invariance
    val again = Profiler.ols2(df.repartition(11), "x1", "x2", "y", Seq("g"))
      .collect().map(r => r.getString(0) -> r.toString).toMap
    assert(again === rows.view.mapValues(_.toString).toMap)
  }

  test("quantileTransform: rank/(n+1) per group, tie-deterministic, invariant") {
    val df = Seq(("G", 30L, 1L), ("G", 10L, 2L), ("G", 20L, 3L),
      ("G", 20L, 4L), ("H", 5L, 9L)).toDF("g", "v", "id")
    // output columns: (g, id, v, q)
    val q = Profiler.quantileTransform(df, Seq("g"), "v", "id")
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(q(2L) === 0.2)          // rank 1 of 4 -> 1/5
    assert(q(3L) === 0.4 && q(4L) === 0.6) // tie splits by id
    assert(q(1L) === 0.8)
    assert(q(9L) === 0.5)          // singleton group -> 1/2
    val again = Profiler.quantileTransform(df.repartition(7), Seq("g"), "v", "id")
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(again === q)
  }

  test("autocorrelation: alternating series -> r1 = -0.875 exactly") {
    val ev = (0 until 8).map { t =>
      (t.toLong, f"2024-01-${t + 1}%02d 12:00:00", "s",
        if (t % 2 == 0) 1.0 else 2.0)
    }.toDF("event_id", "ts", "sym", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    val rows = EventAnalytics.autocorrelation(ev, "ts", "sym", "value",
        maxLag = 2)
      .collect().map(r => r.getInt(1) -> r).toMap
    assert(rows(1).getLong(3) === 7L && rows(1).getDouble(4) === -0.875)
    // lag 2: 6 aligned pairs, all (dev*dev) = +0.25 -> 6*0.25/(8*0.25) = 0.75
    assert(rows(2).getDouble(4) === 0.75)
    // constant series: zero variance -> NULL acf
    val const = (0 until 5).map(t =>
      (t.toLong, f"2024-02-${t + 1}%02d 12:00:00", "c", 3.0))
      .toDF("event_id", "ts", "sym", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    assert(EventAnalytics.autocorrelation(const, "ts", "sym", "value", maxLag = 1)
      .head().isNullAt(4))
  }

  test("anovaF: hand-checked F; zero effect -> F~0; degenerate -> NULL") {
    // groups A={1,2,3}, B={4,5,6}: means 2 and 5, SSB=13.5, SSW=4,
    // F = (13.5/1)/(4/4) = 13.5, eta^2 = 13.5/17.5
    val df = Seq(("A", 1L), ("A", 2L), ("A", 3L),
      ("B", 4L), ("B", 5L), ("B", 6L)).toDF("g", "v")
    val r = Profiler.anovaF(df, "g", "v").head()
    assert((r.getLong(0), r.getLong(1)) === ((2L, 6L)))
    assert(math.abs(r.getDouble(3) - 13.5) < 1e-9, s"ssb ${r.getDouble(3)}")
    assert(math.abs(r.getDouble(4) - 13.5) < 1e-6, s"F ${r.getDouble(4)}")
    assert(math.abs(r.getDouble(5) - 13.5 / 17.5) < 1e-6)
    // identical group distributions: F = 0
    val flat = Seq(("A", 1L), ("A", 2L), ("B", 1L), ("B", 2L)).toDF("g", "v")
    assert(math.abs(Profiler.anovaF(flat, "g", "v").head().getDouble(4)) < 1e-9)
    // one group: NULL F
    assert(Profiler.anovaF(Seq(("A", 1L), ("A", 2L)).toDF("g", "v"), "g", "v")
      .head().isNullAt(4))
  }

  test("isotonicCalibrate: pools violators exactly, leaves monotone input") {
    // bin rates 0.5, 0.2, 0.8 -> PAVA pools bins 0,1 to 2/7
    def mk(bin: Int, n: Int, pos: Int) =
      (0 until n).map(i => (bin * 10 + 5.0, i < pos))
    val df = (mk(0, 2, 1) ++ mk(1, 5, 1) ++ mk(2, 5, 4)).toDF("score", "label")
    val out = Profiler.isotonicCalibrate(df, "score", "label", nBins = 10,
      lo = 0.0, hi = 100.0).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    val pooled = BigDecimal(2.0 / 7.0).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0L) === pooled && out(1L) === pooled && out(2L) === 0.8)
    // iso_rate is non-decreasing in bin, always
    val sorted = Profiler.isotonicCalibrate(df, "score", "label", 10, 0, 100)
      .orderBy("bin").collect().map(_.getDouble(4))
    assert(sorted.sliding(2).forall(p => p(0) <= p(1)))
    // already-monotone rates pass through untouched
    val mono = (mk(0, 4, 1) ++ mk(1, 4, 2) ++ mk(2, 4, 3)).toDF("score", "label")
    val m = Profiler.isotonicCalibrate(mono, "score", "label", 10, 0, 100)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(3), r.getDouble(4)))).toMap
    m.values.foreach { case (raw, iso) => assert(raw === iso) }
  }

  test("spearman: monotone warp -> 1, reversal -> -1, ties midranked") {
    // y = x^3 (monotone, nonlinear): rho exactly 1
    val mono = (1L to 20L).map(i => (i, i * i * i)).toDF("x", "y")
    assert(Profiler.spearman(mono, "x", "y").head().getDouble(1) === 1.0)
    // reversed: exactly -1
    val rev = (1L to 20L).map(i => (i, -i)).toDF("x", "y")
    assert(Profiler.spearman(rev, "x", "y").head().getDouble(1) === -1.0)
    // hand-checked tie case: x=(1,2,2,3), y=(10,20,30,40)
    // midranks x = (1, 2.5, 2.5, 4), y = (1,2,3,4); rho = 0.9486833
    val tie = Seq((1L, 10L), (2L, 20L), (2L, 30L), (3L, 40L)).toDF("x", "y")
    val rho = Profiler.spearman(tie, "x", "y").head().getDouble(1)
    assert(math.abs(rho - 0.948683) < 1e-6, s"rho $rho")
    // layout invariance
    val big = (1L to 500L).map(i => (i % 37, (i * 17) % 101)).toDF("x", "y")
    assert(Profiler.spearman(big, "x", "y").head().toString ===
      Profiler.spearman(big.repartition(11), "x", "y").head().toString)
  }

  test("mannWhitneyU: hand ranks with midrank ties; dominance signs; sigma=0") {
    // A={1,2}, B={3,4}: U_A = 0, rank-biserial = -1 (B dominates)
    val low = (Seq(1L, 2L).map(("A", _)) ++ Seq(3L, 4L).map(("B", _))).toDF("g", "v")
    val r = Profiler.mannWhitneyU(low, "v", "g", "A", "B").head()
    assert(r.getDouble(2) === 0.0 && r.getDouble(4) === -1.0)
    assert(r.getDouble(3) < 0, "z negative when A sits below B")
    // reversed: U_A = nA*nB = 4, effect size +1
    val hi = (Seq(3L, 4L).map(("A", _)) ++ Seq(1L, 2L).map(("B", _))).toDF("g", "v")
    val h = Profiler.mannWhitneyU(hi, "v", "g", "A", "B").head()
    assert(h.getDouble(2) === 4.0 && h.getDouble(4) === 1.0 && h.getDouble(3) > 0)
    // midrank tie: A={1}, B={1} -> R_A = 1.5, U_A = 0.5; sigma = 0 -> z NULL
    val tie = Seq(("A", 1L), ("B", 1L)).toDF("g", "v")
    val t = Profiler.mannWhitneyU(tie, "v", "g", "A", "B").head()
    assert(t.getDouble(2) === 0.5 && t.isNullAt(3))
    // layout invariance on a bigger mixed sample
    val big = (1L to 100L).map(i => (if (i % 3 == 0) "A" else "B", i % 17))
      .toDF("g", "v")
    val b1 = Profiler.mannWhitneyU(big, "v", "g", "A", "B").head()
    val b2 = Profiler.mannWhitneyU(big.repartition(13), "v", "g", "A", "B").head()
    assert(b1.toString === b2.toString)
  }

  test("cramersV: bijection -> 1, independence -> 0, 1-dim -> NULL") {
    val dep = (0 until 40).map(i => (s"k${i % 4}", (i % 4).toLong)).toDF("a", "b")
    val d = Profiler.cramersV(dep, "a", "b").head()
    assert(math.abs(d.getDouble(4) - 1.0) < 1e-6, s"V ${d.getDouble(4)}")
    val ind = (0 until 64).map(i => (s"k${i % 4}", ((i / 4) % 4).toLong)).toDF("a", "b")
    val iv = Profiler.cramersV(ind, "a", "b").head()
    assert(math.abs(iv.getDouble(3)) < 1e-9 && math.abs(iv.getDouble(4)) < 1e-9)
    val one = Profiler.cramersV(Seq(("x", 1L), ("x", 2L)).toDF("a", "b"), "a", "b")
      .head()
    assert(one.isNullAt(4), "single-category dimension has no V")
  }

  test("cohensKappa: textbook 2x2, perfect agreement 1, chance-level 0, " +
    "single-category NULL") {
    // Cohen's classic: agree 20+15=35 of 50; pA_yes=25/50, pB_yes=30/50
    // po=0.70, pe=0.5*0.6+0.5*0.4=0.50, kappa=(0.70-0.50)/0.50=0.40
    val classic = ((1 to 20).map(_ => (true, true)) ++
      (1 to 5).map(_ => (true, false)) ++
      (1 to 10).map(_ => (false, true)) ++
      (1 to 15).map(_ => (false, false))).toDF("a", "b")
    val c = Profiler.cohensKappa(classic, "a", "b").head()
    assert(c.getLong(0) == 50L && c.getLong(1) == 35L)
    assert(c.getDouble(2) === 0.7 && c.getDouble(3) === 0.5 &&
      math.abs(c.getDouble(4) - 0.4) < 1e-9, s"got $c")
    // perfect agreement with both categories present -> kappa 1
    val perfect = Seq((true, true), (false, false), (true, true)).toDF("a", "b")
    assert(Profiler.cohensKappa(perfect, "a", "b").head().getDouble(4) === 1.0)
    // a single shared category: pe = 1, kappa undefined -> NULL
    val mono = Seq((true, true), (true, true)).toDF("a", "b")
    assert(Profiler.cohensKappa(mono, "a", "b").head().isNullAt(4))
    // layout invariance
    val k1 = Profiler.cohensKappa(classic, "a", "b").head().toString
    val k2 = Profiler.cohensKappa(classic.repartition(7), "a", "b").head().toString
    assert(k1 === k2)
  }

  test("calibrationBins: perfectly calibrated scores gap 0; ece weights shares") {
    // bin 2 (score .25): 4 rows, 1 positive -> frac .25 = mean_pred, gap 0
    // bin 7 (score .75): 4 rows, 3 positive -> gap 0; ece = 0
    val cal = ((1 to 4).map(i => (0.25, i == 1)) ++
      (1 to 4).map(i => (0.75, i <= 3))).toDF("s", "y")
    val rows = Profiler.calibrationBins(cal, "s", "y", nBins = 10)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet == Set(2L, 7L))
    assert(rows(2L).getDouble(6) === 0.0 && rows(7L).getDouble(6) === 0.0)
    assert(rows(2L).getDouble(7) === 0.0, "perfect calibration must give ece 0")
    // miscalibrated: score .9 but only half positive -> gap .4, ece = .4
    val bad = ((1 to 4).map(i => (0.9, i <= 2))).toDF("s", "y")
    val b = Profiler.calibrationBins(bad, "s", "y", nBins = 10).head()
    assert(b.getLong(0) == 9L && math.abs(b.getDouble(6) - 0.4) < 1e-9 &&
      math.abs(b.getDouble(7) - 0.4) < 1e-9, s"got $b")
    // out-of-range and null scores are excluded, boundary 1.0 lands in
    // the top bin
    val edge = Seq((1.0, true), (1.5, true), (-0.1, false))
      .toDF("s", "y").union(Seq(("x", "t")).toDF("a", "b")
        .select(lit(null).cast("double").as("s"), lit(true).as("y")))
    val e = Profiler.calibrationBins(edge, "s", "y", nBins = 10).collect()
    assert(e.length == 1 && e.head.getLong(0) == 9L && e.head.getLong(1) == 1L)
  }

  test("gini: perfect equality 0, extreme concentration -> (n-1)/n; invariant") {
    // group E: all equal -> G = 0; group C: one holder -> G = (n-1)/n
    val e = (1L to 8L).map(i => ("E", 100L, i))
    val c = (1L to 7L).map(i => ("C", 0L, i)) :+ (("C", 800L, 8L))
    val df = (e ++ c).toDF("g", "v", "id")
    val rows = Profiler.gini(df, Seq("g"), "v", "id")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("E").getDouble(3) === 0.0)
    assert(math.abs(rows("C").getDouble(3) - 7.0 / 8.0) < 1e-9)
    // hand case: {1,3} -> G = 2*(1*1+2*3)/(2*4) - 3/2 = 14/8 - 12/8 = 0.25
    val h = Profiler.gini(Seq(("H", 1L, 1L), ("H", 3L, 2L)).toDF("g", "v", "id"),
      Seq("g"), "v", "id").head()
    assert(math.abs(h.getDouble(3) - 0.25) < 1e-9)
    // zero-total group yields NULL, and layout does not change anything
    val z = Profiler.gini(Seq(("Z", 0L, 1L)).toDF("g", "v", "id"),
      Seq("g"), "v", "id").head()
    assert(z.isNullAt(3))
    val again = Profiler.gini(df.repartition(9), Seq("g"), "v", "id")
      .collect().map(r => r.getString(0) -> r.toString).toMap
    assert(again === rows.view.mapValues(_.toString).toMap)
  }

  test("ksTest: hand-checked max gap, tie takes smallest value; invariant") {
    // A={1,2,3,4}, B={3,4,5,6}: D = 0.5, first reached at v=2 (tie at 3)
    val df = (Seq(1L, 2L, 3L, 4L).map(("A", _)) ++
      Seq(3L, 4L, 5L, 6L).map(("B", _))).toDF("g", "v")
    val r = Profiler.ksTest(df, "v", "g", "A", "B").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((4L, 4L, 8L, 2L)))
    assert(r.getDouble(4) === 0.5)
    // identical samples: D = 0, p clamps to 1
    val same = Profiler.ksTest(
      (Seq(1L, 2L).map(("A", _)) ++ Seq(1L, 2L).map(("B", _))).toDF("g", "v"),
      "v", "g", "A", "B").head()
    assert(same.getLong(2) === 0L && same.getDouble(5) === 1.0)
    // disjoint supports: D = 1, p near 0
    val far = Profiler.ksTest(
      ((1L to 50L).map(("A", _)) ++ (100L to 149L).map(("B", _))).toDF("g", "v"),
      "v", "g", "A", "B").head()
    assert(far.getDouble(4) === 1.0 && far.getDouble(5) < 1e-6)
    // layout invariance
    val r2 = Profiler.ksTest(df.repartition(7), "v", "g", "A", "B").head()
    assert(r2.toString === r.toString)
  }

  test("mutualInformation: NMI=1 on a bijection, ~0 on independence") {
    // bijection: b = a -> MI = H(a) = H(b) -> NMI = 1
    val dep = (0 until 64).map(i => (s"k${i % 4}", (i % 4).toLong))
      .toDF("a", "b")
    val d = Profiler.mutualInformation(dep, "a", "b").head()
    assert(d.getLong(0) === 64L)
    assert(math.abs(d.getDouble(1) - d.getDouble(2)) < 1e-6, "MI = H(a)")
    assert(math.abs(d.getDouble(4) - 1.0) < 1e-6, s"NMI ${d.getDouble(4)}")
    // independence: uniform 4x4 grid -> MI exactly 0 (each cell term ln(1))
    val ind = (0 until 64).map(i => (s"k${i % 4}", ((i / 4) % 4).toLong))
      .toDF("a", "b")
    val ir = Profiler.mutualInformation(ind, "a", "b").head()
    assert(math.abs(ir.getDouble(1)) < 1e-9, s"independent MI ${ir.getDouble(1)}")
    // nulls excluded, not crashed on
    val withNulls = dep.union(Seq((null.asInstanceOf[String], 9L)).toDF("a", "b"))
    assert(Profiler.mutualInformation(withNulls, "a", "b").head().getLong(0) === 64L)
  }

  test("theilSen shrugs off the outlier that drags OLS") {
    val clean = (1 to 9).map(x => ("g", x, 3L * x + 5))
    val df = (clean :+ (("g", 10, 1000L))).toDF("g", "x", "y")
    val ts = Profiler.theilSen(df, "x", "y", Seq("g")).collect()(0)
    assert(ts.getDouble(1) == 3.0, s"robust slope ${ts.getDouble(1)}")
    val ols = Profiler.trend(df, "x", "y", Seq("g")).collect()(0)
    assert(ols.getDouble(2) > 30.0, "the outlier must visibly drag OLS")
    // the maxGroupRows guard excludes oversized groups instead of exploding
    val big = spark.range(0, 200).select(lit("h").as("g"),
      col("id").cast("int").as("x"), col("id").as("y"))
    assert(Profiler.theilSen(big.toDF("g", "x", "y"), "x", "y", Seq("g"),
      maxGroupRows = 100).isEmpty)
  }

  test("abTest: hand-computed chi-square and exact boundary verdicts") {
    def cohort(variant: String, n: Int, conv: Int) =
      (0 until n).map(i => (s"$variant$i", variant, i < conv))
    val df = (cohort("a", 100, 60) ++ cohort("b", 100, 40))
      .toDF("uid", "variant", "converted")
    val r = EventAnalytics.abTest(df, "variant", "converted").collect()(0)
    // 2x2: (60,40 / 40,60), n=200 → chi2 = 200·2000²/100⁴ = 8.0 exactly
    assert(r.getAs[Long]("n_a") == 100L && r.getAs[Long]("conv_a") == 60L)
    assert(r.getAs[Double]("chi2") == 8.0)
    assert(r.getAs[Boolean]("significant"))
    // identical rates: chi2 = 0, not significant
    val even = (cohort("a", 50, 20) ++ cohort("b", 50, 20))
      .toDF("uid", "variant", "converted")
    val r2 = EventAnalytics.abTest(even, "variant", "converted").collect()(0)
    assert(r2.getAs[Double]("chi2") == 0.0 && !r2.getAs[Boolean]("significant"))
  }

  test("trend recovers an exact linear series; degenerate groups are NULL") {
    val df = Seq(
      ("a", 10, 35L), ("a", 11, 38L), ("a", 12, 41L), ("a", 13, 44L),
      ("b", 5, 7L),                      // single point: slope NULL
      ("c", 9, 1L), ("c", 9, 5L)         // zero x-variance: slope NULL
    ).toDF("g", "x", "y")
    val got = Profiler.trend(df, "x", "y", Seq("g")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("a").getLong(1) == 4L)
    assert(got("a").getDouble(2) == 3.0)   // y = 3x + 5
    assert(got("a").getDouble(3) == 5.0)
    assert(got("b").isNullAt(2) && got("c").isNullAt(2))
  }

  test("periodogram: a planted weekly cycle dominates at p=7; a flat " +
      "series leaves only quantization dust") {
    def mk(v: Int => Double) = (0 until 70).map { t =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(t)),
        v(t))
    }.toDF("d", "v")
    // mean-free planted cycle: the untapered periodogram leaks the DC
    // mean into non-dividing periods (p=11 ∤ 70), which is inherent —
    // the dominance assertion tests the CYCLE, so plant it without DC
    val weekly = mk(t => 50.0 * math.cos(2.0 * math.Pi * t / 7.0))
    val flat = mk(_ => 100.0)
    val ps = Seq(5, 7, 11)
    def powers(df: org.apache.spark.sql.DataFrame) =
      EventAnalytics.periodogram(df, "d", "v", ps)
        .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    val pw = powers(weekly)
    assert(pw(7L) > 100.0 * pw(5L) && pw(7L) > 100.0 * pw(11L),
      s"weekly peak not dominant: $pw")
    val pf = powers(flat)
    // 70 days = full cycles at p=7: quantized-cos sums cancel to ~0
    assert(pf(7L) < 1e-6 * pw(7L), s"flat series power too big: $pf")
    // every period sees all 70 days
    val nd = EventAnalytics.periodogram(weekly, "d", "v", ps)
      .collect().map(r => r.getLong(1)).toSet
    assert(nd === Set(70L))
  }
}
