package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.x.{EventAnalytics, Profiler, Sampling}

class EventAnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("funnel counts stages completed strictly in order") {
    // u1 completes all 3 in order; u2 does B before A (depth 1 after A);
    // u3 never does A (depth 0, excluded); noise events are ignored
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 101L, "A"),
      (1L, ts("2024-01-01 11:00:00"), 102L, "noise"),
      (1L, ts("2024-01-01 12:00:00"), 103L, "B"),
      (1L, ts("2024-01-02 09:00:00"), 104L, "C"),
      (2L, ts("2024-01-01 08:00:00"), 201L, "B"),
      (2L, ts("2024-01-01 09:00:00"), 202L, "A"),
      (3L, ts("2024-01-01 09:00:00"), 301L, "B")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = EventAnalytics.funnel(ev, "user_id", "ts", "event_id", "event_type",
      Seq("A", "B", "C")).orderBy("stage_idx").collect()
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq ===
      Seq((1, "A", 2L), (2, "B", 1L), (3, "C", 1L)))
  }

  test("funnel advances on a later same-type event, not an earlier one") {
    // B happens before A AND after A: the fold must use the later B
    val ev = Seq(
      (1L, ts("2024-01-01 08:00:00"), 1L, "B"),
      (1L, ts("2024-01-01 09:00:00"), 2L, "A"),
      (1L, ts("2024-01-01 10:00:00"), 3L, "B")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = EventAnalytics.funnel(ev, "user_id", "ts", "event_id", "event_type",
      Seq("A", "B")).orderBy("stage_idx").collect()
    assert(out.map(r => (r.getInt(0), r.getLong(2))).toSeq === Seq((1, 1L), (2, 1L)))
  }

  test("funnelWithin enforces the conversion window between stages") {
    val ev = Seq(
      // u1: A then B 2 days later (inside the 3-day window) → depth 2
      (1L, ts("2024-01-01 10:00:00"), 1L, "A"),
      (1L, ts("2024-01-03 10:00:00"), 2L, "B"),
      // u2: A then B 5 days later (outside) → depth 1
      (2L, ts("2024-01-01 10:00:00"), 3L, "A"),
      (2L, ts("2024-01-06 10:00:00"), 4L, "B"),
      // u3: window anchors on the FIRST completion of a stage — also depth 1
      (3L, ts("2024-01-01 10:00:00"), 5L, "A"),
      (3L, ts("2024-01-06 10:00:00"), 6L, "B")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = EventAnalytics.funnelWithin(ev, "user_id", "ts", "event_id", "event_type",
      Seq("A", "B"), maxGap = "3 days").orderBy("stage_idx").collect()
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq ===
      Seq((1, "A", 3L), (2, "B", 1L)))
    // first stage has no window: a lone A years after epoch still counts
    val first = EventAnalytics.funnelWithin(
      Seq((9L, ts("2030-06-01 00:00:00"), 9L, "A")).toDF("user_id", "ts", "event_id", "event_type"),
      "user_id", "ts", "event_id", "event_type", Seq("A", "B"), maxGap = "1 hours")
    assert(first.collect().map(r => r.getLong(2)).toSeq === Seq(1L))
  }

  test("retention buckets users by first-event week and counts active weeks") {
    val ev = Seq(
      // u1: cohort week of Jan 1 (Mon); active weeks 0 and 2
      (1L, ts("2024-01-02 10:00:00"), 1L, "view"),
      (1L, ts("2024-01-16 10:00:00"), 2L, "view"),
      // u2: cohort week of Jan 8; active weeks 0, 0 (dup), 1
      (2L, ts("2024-01-08 10:00:00"), 3L, "view"),
      (2L, ts("2024-01-09 10:00:00"), 4L, "view"),
      (2L, ts("2024-01-15 10:00:00"), 5L, "view")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = EventAnalytics.retention(ev, "user_id", "ts")
      .orderBy("cohort_week", "week_offset")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    assert(out === Seq(
      ("2024-01-01", 0, 1L), ("2024-01-01", 2, 1L),
      ("2024-01-08", 0, 1L), ("2024-01-08", 1, 1L)))
  }

  test("fillDailyGaps densifies the calendar with zero-fill and carry-forward") {
    val ev = Seq(
      ("a", ts("2024-01-01 10:00:00")), ("a", ts("2024-01-01 11:00:00")),
      ("a", ts("2024-01-04 10:00:00")), // gap: Jan 2, 3 missing
      ("b", ts("2024-02-01 09:00:00"))  // single-day series: no gaps
    ).toDF("event_type", "ts")
    val out = EventAnalytics.fillDailyGaps(ev, "ts", "event_type")
      .orderBy("event_type", "day")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out === Seq(
      ("a", "2024-01-01", 2L, 2L),
      ("a", "2024-01-02", 0L, 2L), // zero-filled; carry keeps Jan 1's count
      ("a", "2024-01-03", 0L, 2L),
      ("a", "2024-01-04", 1L, 1L),
      ("b", "2024-02-01", 1L, 1L)))
  }

  test("dailyDeltas shows gap days as real -100% drops") {
    val ev = Seq(
      ("a", ts("2024-01-01 10:00:00")), ("a", ts("2024-01-01 11:00:00")),
      ("a", ts("2024-01-03 10:00:00")) // Jan 2 missing entirely
    ).toDF("event_type", "ts")
    val out = EventAnalytics.dailyDeltas(ev, "ts", "event_type").orderBy("day")
      .collect().map(r => (r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3),
        if (r.isNullAt(4)) null else r.getDouble(4))).toSeq
    assert(out === Seq(
      ("2024-01-01", 2L, null, null),          // first day: no prior
      ("2024-01-02", 0L, -2L, -100.0),         // the outage is visible
      ("2024-01-03", 1L, 1L, null)))           // prior was 0: pct undefined
  }

  test("transitionMatrix: counts follow each user's timeline, probabilities normalize") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "click"),
      (1L, ts("2024-01-01 10:02:00"), 3L, "buy"),
      (2L, ts("2024-01-01 10:00:00"), 4L, "view"),
      (2L, ts("2024-01-01 10:01:00"), 5L, "view"),
      // user 3's single event produces NO transition
      (3L, ts("2024-01-01 10:00:00"), 6L, "buy"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val m = EventAnalytics.transitionMatrix(ev, "user_id", "ts", "event_id", "event_type")
    val got = m.collect().map(r =>
      (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got == Map(
      ("view", "click") -> (1L, 0.5), ("view", "view") -> (1L, 0.5),
      ("click", "buy") -> (1L, 1.0)))
    // per-source probabilities always sum to 1 (a structural law)
    val sums = m.groupBy("from_type").agg(sum("p").as("s"))
      .collect().map(_.getDouble(1))
    assert(sums.forall(s => math.abs(s - 1.0) < 1e-9))
  }

  test("dailyAnomalies flags a spike day and nothing on a flat series") {
    // flat series: 2 events every day → variance 0, no anomaly
    // spiky series: 1/day for 9 days then 21 → z = 180/sqrt(...) > 2 on
    // day 10 only (n must be ≥ 7: the max possible z of n points is
    // (n-1)/sqrt(n), so short series can never flag — by design)
    val rows =
      (1 to 9).flatMap(d => Seq.tabulate(2)(i => ("flat", ts(f"2024-01-$d%02d 0$i:00:00")))) ++
      (1 to 9).map(d => ("spiky", ts(f"2024-01-$d%02d 01:00:00"))) ++
      Seq.tabulate(21)(i => ("spiky", ts(f"2024-01-10 ${10 + i % 10}:${i % 60}%02d:00")))
    val ev = rows.toDF("event_type", "ts")
    val out = EventAnalytics.dailyAnomalies(ev, "ts", "event_type")
    assert(out.filter($"event_type" === "flat" && $"is_anomaly").count() === 0)
    val flagged = out.filter($"event_type" === "spiky" && $"is_anomaly")
      .select("day").as[String].collect().toSeq
    assert(flagged === Seq("2024-01-10"))
  }

  test("profiler computes null/distinct/min/max per column in one pass") {
    val df = Seq(
      (1L, Some("a")), (2L, None), (3L, Some("b")), (4L, Some("a"))
    ).toDF("id", "s")
    val out = Profiler.profile(df, Seq("id", "s")).orderBy("column_name").collect()
    val byName = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(byName("id") === ((4L, 0L, 4L, "1", "4")))
    assert(byName("s") === ((3L, 1L, 2L, "a", "b")))
  }

  test("profiler approx mode avoids the Expand plan and stays within HLL error") {
    val df = spark.range(1000).selectExpr("id", "CAST(id % 100 AS STRING) AS s")
    val plan = Profiler.profile(df, Seq("id", "s"), exact = true)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"))
    val approxPlan = Profiler.profile(df, Seq("id", "s"), exact = false)
      .queryExecution.executedPlan.toString
    assert(!approxPlan.contains("Expand"))
    val nd = Profiler.profile(df, Seq("s"), exact = false)
      .select("n_distinct").as[Long].head()
    assert(nd > 90 && nd < 110)
  }

  test("capPerGroup keeps exactly k deterministic rows per group, map-side limited") {
    val df = (0 until 400).map(i => (i.toLong, s"g${i % 4}")).toDF("id", "g")
    val capped = Sampling.capPerGroup(df, "g", "id", k = 7)
    val counts = capped.groupBy("g").count().collect().map(r => r.getLong(1)).toSeq
    assert(counts === Seq.fill(4)(7L))
    // deterministic under repartitioning
    val again = Sampling.capPerGroup(df.repartition(13), "g", "id", k = 7)
    assert(capped.select("id").except(again.select("id")).count() === 0)
    // the rank<=k filter must compile to WindowGroupLimit (map-side top-k
    // before the exchange — the 100 TB property)
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"))
    // groups smaller than k keep everything
    val small = Sampling.capPerGroup(
      Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "g"), "g", "id", k = 7)
    assert(small.count() === 3)
  }

  test("mixtureRebalance hits the target mix without upsampling and is deterministic") {
    val df = (0 until 1000).map(i => (i.toLong, s"src${i % 4}"))
      .toDF("doc_id", "source")
    // 2:1:1 over src0..src2; src3 dropped. Binding stratum keeps all.
    val out = Sampling.mixtureRebalance(df, "doc_id", "source",
      Map("src0" -> 2L, "src1" -> 1L, "src2" -> 1L))
    val counts = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!counts.contains("src3"))
    // src0 is binding (needs 2x its own count): keeps everything
    assert(counts("src0") === 250L)
    // others sample toward 125 each (hash granularity gives a few ±)
    assert(math.abs(counts("src1") - 125L) <= 15)
    assert(math.abs(counts("src2") - 125L) <= 15)
    // deterministic: same call, same kept set, regardless of partitioning
    val again = Sampling.mixtureRebalance(df.repartition(7), "doc_id", "source",
      Map("src0" -> 2L, "src1" -> 1L, "src2" -> 1L))
    assert(out.select("doc_id").except(again.select("doc_id")).count() === 0)
    assert(again.select("doc_id").except(out.select("doc_id")).count() === 0)
  }

  test("sessionize splits on gap > g, keeps a gap exactly at g, micro-exact") {
    def us(base: String, micros: Long) =
      java.sql.Timestamp.from(java.time.Instant.parse(base).plusNanos(micros * 1000))
    val t0 = "2024-01-01T10:00:00Z"
    val ev = Seq(
      // u1: e2 exactly 60s after e1 (same session: rule is strict >),
      // e3 60.000001s after e2 (one microsecond over: NEW session)
      (1L, us(t0, 0L), 1L),
      (1L, us(t0, 60000000L), 2L),
      (1L, us(t0, 120000001L), 3L),
      // u2: isolated single event — its own session, duration 0
      (2L, us(t0, 0L), 4L)
    ).toDF("user_id", "ts", "event_id")
    val out = EventAnalytics.sessionize(ev, "user_id", "ts", "event_id", gapSeconds = 60)
      .select("user_id", "event_id", "session_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === Set((1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 2L), (2L, 4L, 1L)))
    val stats = EventAnalytics.sessionStats(ev, "user_id", "ts", "event_id", 60)
      .orderBy("user_id", "session_idx")
      .select("user_id", "session_idx", "n_events", "duration_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(stats.toSeq === Seq((1L, 1L, 2L, 60000000L), (1L, 2L, 1L, 0L),
      (2L, 1L, 1L, 0L)))
    // partitioning-invariant: the session assignment is a pure function of
    // the (user)-ordered timeline, not of physical layout
    val again = EventAnalytics.sessionize(ev.repartition(7), "user_id", "ts",
      "event_id", 60).select("user_id", "event_id", "session_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again === out)
  }

  test("tCloseness flags a skewed quasi-group that k-anon and l-div pass") {
    import spark.implicits._
    // group A mirrors the global 50/50 split; group B is 45/5 — large
    // (k-anonymous) and diverse (2 sensitive values) yet skewed
    val rows =
      (1 to 25).map(i => ("A", 0)) ++ (1 to 25).map(i => ("A", 1)) ++
      (1 to 45).map(i => ("B", 0)) ++ (1 to 5).map(i => ("B", 1))
    val df = rows.toDF("seg", "sensitive")
    val got = graft.x.Privacy.tClosenessAudit(df, Seq("seg"), "sensitive", 0.15)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getBoolean(3)))
      .toMap
    // global q = (0.7, 0.3); with m=2 the EMD/(m−1) reduces to |p0−q0|:
    // A p = (0.5, 0.5) → t = 0.2; B p = (0.9, 0.1) → t = 0.2
    assert(math.abs(got("A")._1 - 0.2) < 1e-9, s"$got")
    assert(math.abs(got("B")._1 - 0.2) < 1e-9, s"$got")
    assert(!got("A")._2 && !got("B")._2)
    // a group matching the global distribution has t = 0 and passes
    val df2 = rows.toDF("seg", "sensitive")
      .union(Seq.fill(35)(("C", 0)).toDF("seg", "sensitive"))
      .union(Seq.fill(15)(("C", 1)).toDF("seg", "sensitive"))
    val g2 = graft.x.Privacy.tClosenessAudit(df2, Seq("seg"), "sensitive", 0.15)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getBoolean(3)))
      .toMap
    assert(g2("C")._1 == 0.0 && g2("C")._2, s"$g2")
  }

  test("bootstrapMeanCi: interval brackets the mean and narrows with n") {
    import spark.implicits._
    def frame(n: Int) = (1 to n)
      .map(i => ("g", i.toLong, 50.0 + (i % 21) - 10)).toDF("g", "id", "v")
    def ci(n: Int) = {
      val r = Profiler.bootstrapMeanCi(frame(n), Seq("g"), "v", col("id"))
        .head()
      (r.getAs[Double]("mean_est"), r.getAs[Double]("ci_lo"),
        r.getAs[Double]("ci_hi"))
    }
    val (m1, lo1, hi1) = ci(200)
    assert(lo1 <= m1 && m1 <= hi1, s"interval must bracket the mean: $lo1 $m1 $hi1")
    assert(hi1 > lo1, "nonzero width")
    val (_, lo2, hi2) = ci(3200)
    assert(hi2 - lo2 < hi1 - lo1,
      s"16x data must narrow the interval: ${hi1 - lo1} -> ${hi2 - lo2}")
    // deterministic under partitioning
    val a = Profiler.bootstrapMeanCi(frame(200).repartition(7), Seq("g"), "v",
      col("id")).head()
    val b = Profiler.bootstrapMeanCi(frame(200).coalesce(1), Seq("g"), "v",
      col("id")).head()
    assert(a.getAs[Double]("ci_lo") == b.getAs[Double]("ci_lo") &&
      a.getAs[Double]("ci_hi") == b.getAs[Double]("ci_hi"))
  }

  test("markovAttribution: removal effect credits the load-bearing channel") {
    import spark.implicits._
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-06-01 10:$m%02d:00")
    // every conversion goes through 'ad'; 'spam' appears only on
    // non-converting journeys. Removing 'ad' must zero conversions
    // (share → 1); removing 'spam' must change nothing (share → 0).
    val ev = Seq(
      (1L, t(0), 1L, "ad"), (1L, t(1), 2L, "buy"),
      (2L, t(0), 3L, "ad"), (2L, t(1), 4L, "buy"),
      (3L, t(0), 5L, "spam"), (3L, t(1), 6L, "spam"),
      (4L, t(0), 7L, "spam"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = EventAnalytics.markovAttribution(ev, "user_id", "ts", "event_id",
        "event_type", convType = "buy")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(3), r.getDouble(4))).toMap
    val (baseCvr, _, adShare) = got("ad")
    assert(math.abs(baseCvr - 0.5) < 1e-9, s"base CVR should be 2/4: $got")
    assert(math.abs(adShare - 1.0) < 1e-9, s"'ad' carries all credit: $got")
    assert(got("spam")._3 == 0.0 && got("spam")._2 == 0L,
      s"'spam' earns nothing: $got")
  }

  test("conversionPaths: absorption at first conversion, direct bucket, cvr") {
    import spark.implicits._
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-06-01 10:$m%02d:00")
    val ev = Seq(
      // two users: view>click then buy; one user: view>click, no buy
      (1L, t(0), 1L, "view"), (1L, t(1), 2L, "click"), (1L, t(2), 3L, "buy"),
      (2L, t(0), 4L, "view"), (2L, t(1), 5L, "click"), (2L, t(2), 6L, "buy"),
      (3L, t(0), 7L, "view"), (3L, t(1), 8L, "click"),
      // purchase-first user → "(direct)"
      (4L, t(0), 9L, "buy"),
      // post-conversion events must NOT extend the path
      (1L, t(5), 10L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = EventAnalytics.conversionPaths(ev, "user_id", "ts", "event_id",
        "event_type", convType = "buy")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(got("view>click") == ((3L, 2L, 2.0 / 3.0)), s"$got")
    assert(got("(direct)") == ((1L, 1L, 1.0)), s"$got")
    assert(got.size == 2, s"unexpected paths: $got")
  }

  test("kaplanMeier: censoring keeps at-risk mass that naive averaging drops") {
    import spark.implicits._
    // 4 events at t=1 (of 10 at risk), 2 at t=2 (of 6 at risk after 4
    // died... minus nothing censored before), censored users at t>=2
    val durs = Seq(
      (1L, true), (1L, true), (1L, true), (1L, true),
      (2L, true), (2L, true),
      (2L, false), (3L, false), (3L, false), (4L, false))
      .toDF("dur", "event")
    val got = EventAnalytics.kaplanMeier(durs, "dur", "event")
      .orderBy("t_days").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // t=1: d=4, n=10 → S = 0.6; t=2: d=2, n=6 → S = 0.6·(1−2/6) = 0.4
    assert(got.toSeq == Seq((1L, 4L, 10L, 0.6), (2L, 2L, 6L, 0.4)), got.toSeq)
    // without censoring support the curve would end at 0 — the censored
    // tail keeps S(2) strictly positive
    assert(got.last._4 > 0.0)
  }

  test("holtForecast tracks a linear trend where EWMA would lag") {
    import spark.implicits._
    // perfectly linear series 100, 102, 104, ...: Holt's trend state must
    // converge to the slope and the fit must become exact
    val ev = (0 until 25).map { d =>
      val day = java.sql.Timestamp.valueOf(f"2024-04-${d + 1}%02d 12:00:00")
      (d.toLong, day, "m", 100.0 + 2.0 * d)
    }.toDF("event_id", "ts", "sym", "value")
    val out = EventAnalytics.holtForecast(ev, "ts", "sym", "value")
      .orderBy("day").collect()
    val last = out.last
    // on an exactly linear series init already gives l=x1, b=slope and the
    // recursion preserves it: trend stays 2, fitted equals x exactly
    assert(math.abs(last.getAs[Double]("trend") - 2.0) < 1e-9, s"$last")
    assert(math.abs(last.getAs[Double]("fitted") - last.getAs[Double]("x")) < 1e-9)
    assert(math.abs(last.getAs[Double]("forecast_next") -
      (last.getAs[Double]("x") + 2.0)) < 1e-9)
    // first day has no prior state: fitted is null
    assert(out.head.isNullAt(out.head.fieldIndex("fitted")))
  }

  test("cusum alarms on a small persistent shift that z-scores miss") {
    import spark.implicits._
    // 20 days at 100, then 10 days at 101.2 — a ~1.2-unit shift on a
    // series whose overall σ is small; per-day z never reaches 3σ-style
    // extremes but the cumulative sum marches past hσ
    val ev = (0 until 30).map { d =>
      val day = java.sql.Timestamp.valueOf(f"2024-03-${d + 1}%02d 12:00:00")
      (d.toLong, day, "m", if (d < 20) 100.0 else 101.2)
    }.toDF("event_id", "ts", "sym", "value")
    val out = EventAnalytics.cusumChangepoints(ev, "ts", "sym", "value")
      .orderBy("day").collect()
    val alarms = out.filter(_.getAs[Boolean]("alarm"))
      .map(_.getAs[java.sql.Date]("day").toString)
    assert(alarms.nonEmpty, "persistent shift must eventually alarm")
    // with in-sample μ both sides drift (pre-shift values sit below the
    // contaminated mean, so s⁻ legitimately climbs too); the structural
    // claims are: the HIGH side stays exactly 0 until the shift, and the
    // post-shift tail alarms
    assert(out.last.getAs[Boolean]("alarm"), "post-shift tail must alarm")
    // s_plus is identically 0 before the shift (values sit at −kσ slack)
    out.take(19).foreach(r =>
      assert(r.getAs[Double]("s_plus") == 0.0, s"pre-shift s+ nonzero: $r"))
  }

  test("seasonalDecompose recovers a planted weekday effect") {
    import spark.implicits._
    // 4 weeks of flat level 100 plus +7 every Monday: trend must stay
    // ~100+1 (the Monday bump spread over the 7-day window), the Monday
    // seasonal must absorb ~+6, residuals ~0
    val ev = (0 until 28).map { d =>
      val day = java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00")
      val dow = java.time.LocalDate.of(2024, 1, d + 1).getDayOfWeek.getValue
      (d.toLong, day, "m", if (dow == 1) 107.0 else 100.0)
    }.toDF("event_id", "ts", "sym", "value")
    val out = EventAnalytics.seasonalDecompose(ev, "ts", "sym", "value")
      .filter(col("trend").isNotNull).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val res = r.getAs[Double]("residual")
      assert(math.abs(res) < 1.0, s"residual should be ~0, got $r")
    }
    val monday = out.find(r => r.getAs[java.sql.Date]("day").toLocalDate
      .getDayOfWeek.getValue == 1).get
    assert(monday.getAs[Double]("seasonal") > 4.0,
      s"Monday seasonal must absorb the bump: $monday")
    val tuesday = out.find(r => r.getAs[java.sql.Date]("day").toLocalDate
      .getDayOfWeek.getValue == 2).get
    assert(tuesday.getAs[Double]("seasonal") < 0.0, s"off-days dip: $tuesday")
  }

  test("benfordAudit: geometric data conforms, uniform data flags") {
    import spark.implicits._
    // log-uniform (multiplicative) data follows Benford; uniform [1000,2000)
    // puts every first digit at 1 — chi2 explodes
    val geo = (0 until 4000).map(i => math.pow(10.0, i % 400 / 100.0) * 1.07)
      .toDF("v")
    val chiGeo = Profiler.benfordAudit(geo, "v")
      .agg(sum("chi2_term")).head().getDouble(0)
    val uni = (0 until 4000).map(i => 1000.0 + (i % 1000)).toDF("v")
    val chiUni = Profiler.benfordAudit(uni, "v")
      .agg(sum("chi2_term")).head().getDouble(0)
    // chi-square critical value at 8 d.o.f., p=0.001 is 26.1
    assert(chiUni > 50 * chiGeo && chiUni > 26.1,
      s"uniform must flag hard: geo=$chiGeo uni=$chiUni")
    // digits 2-9 absent from the uniform set, present in the geometric
    assert(Profiler.benfordAudit(uni, "v").count() == 1)
    assert(Profiler.benfordAudit(geo, "v").count() == 9)
  }

  test("activityStreaks: island detection, earliest-streak tie-break") {
    def d(day: Int) = java.sql.Timestamp.valueOf(f"2024-05-$day%02d 09:00:00")
    // user 1: streaks [1-3] and [10-12] (tie on length → earliest wins);
    // user 2: one day only
    val ev = Seq(
      (1L, d(1)), (1L, d(2)), (1L, d(3)), (1L, d(2)), // dup day collapses
      (1L, d(10)), (1L, d(11)), (1L, d(12)),
      (2L, d(20)))
      .zipWithIndex.map { case ((u, t), i) => (i.toLong, u, t) }
      .toDF("event_id", "user_id", "ts")
    val got = EventAnalytics.activityStreaks(ev, "user_id", "ts")
      .select("user_id", "best_streak", "streak_start", "n_streaks")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDate(2).toString, r.getLong(3))).sortBy(_._1)
    assert(got.toSeq === Seq((1L, 3L, "2024-05-01", 2L), (2L, 1L, "2024-05-20", 1L)))
  }

  test("ohlcBars: first/last by (ts,id) replay; twap ignores tick bursts") {
    def ts(m: Int, s: Int = 0): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(f"2024-03-01 10:$m%02d:$s%02d")
    // price holds at 10.0 for 59 min, then a 1-minute burst of 20.0 ticks
    val ev = Seq(
      (1L, ts(0), "s", 10.0),
      (2L, ts(59), "s", 20.0), (3L, ts(59, 10), "s", 20.0),
      (4L, ts(59, 20), "s", 20.0), (5L, ts(60), "s", 20.0))
      .toDF("event_id", "ts", "sym", "value")
    val bar = EventAnalytics.ohlcBars(ev, "sym", "ts", "event_id", "value")
      .select("open", "high", "low", "close", "n_obs").head()
    assert((bar.getDouble(0), bar.getDouble(1), bar.getDouble(2),
      bar.getDouble(3), bar.getLong(4)) === ((10.0, 20.0, 10.0, 20.0, 5L)))
    val twa = EventAnalytics.timeWeightedAvg(ev, "sym", "ts", "event_id", "value")
      .select("twa").head().getDouble(0)
    // tick mean = 18.0 (burst-dominated); time-weighted ≈ 10·(59/60)+20·(1/60)
    assert(math.abs(twa - (10.0 * 59 + 20.0) / 60) < 1e-9, s"twa $twa")
    // single observation: twa is the value itself, zero span
    val one = EventAnalytics.timeWeightedAvg(
      Seq((9L, ts(5), "t", 7.5)).toDF("event_id", "ts", "sym", "value"),
      "sym", "ts", "event_id", "value").select("twa", "span_us").head()
    assert(one.getDouble(0) === 7.5 && one.getLong(1) === 0L)
  }

  test("holtWintersForecast matches a scalar reference fold; learns the cycle") {
    // 2 seasons of init + 8 folded days; value = trend + period-4 cycle
    val m = 4
    val xs = (0 until 16).map(t => 100.0 + 2.0 * t + Seq(10.0, -5.0, 0.0, -5.0)(t % 4))
    val ev = xs.zipWithIndex.map { case (v, t) =>
      (t.toLong, ts(f"2024-01-${t + 1}%02d 12:00:00"), "s", v) }
      .toDF("event_id", "ts", "sym", "value")
    val out = EventAnalytics.holtWintersForecast(ev, "ts", "sym", "value",
        period = m, alpha = 0.25, beta = 0.1, gamma = 0.25)
      .orderBy("day").collect()
    assert(out.length === 16 - 2 * m)
    // scalar reference: identical init + fold in plain doubles
    val a1 = xs.take(m).sum / m
    val a2 = xs.slice(m, 2 * m).sum / m
    var l = a2; var b = (a2 - a1) / m
    var q = (0 until m).map(i => ((xs(i) - a1) + (xs(i + m) - a2)) / 2.0).toVector
    val got = out.map(r => (r.getDouble(3), r.getDouble(4), r.getDouble(6)))
    for (t <- 2 * m until 16) {
      val fitted = l + b + q.head
      val nl = 0.25 * (xs(t) - q.head) + 0.75 * (l + b)
      val nb = 0.1 * (nl - l) + 0.9 * b
      val nq = 0.25 * (xs(t) - nl) + 0.75 * q.head
      q = q.tail :+ nq; l = nl; b = nb
      val (gl, gb, gf) = got(t - 2 * m)
      assert(math.abs(gl - l) < 1e-6 && math.abs(gb - b) < 1e-6 &&
        math.abs(gf - fitted) < 1e-6, s"t=$t got=($gl,$gb,$gf) exp=($l,$b,$fitted)")
    }
    // the one-step fit error shrinks as the seasonal slots converge
    val errs = out.map(r => math.abs(r.getDouble(6) - r.getDouble(2)))
    assert(errs.takeRight(4).max < errs.head,
      s"late fits should beat the first: ${errs.toSeq}")
  }

  test("nextEventAccuracy: argmax from train only, ties to smallest, coverage") {
    // train (before Jan 10): A->B twice, A->C once, B->C once
    // test (from Jan 10): A->B (correct), A->C (wrong), Z->A (uncovered)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "A"), (1L, ts("2024-01-01 11:00:00"), 2L, "B"),
      (1L, ts("2024-01-01 12:00:00"), 3L, "C"),
      (2L, ts("2024-01-02 10:00:00"), 4L, "A"), (2L, ts("2024-01-02 11:00:00"), 5L, "B"),
      (3L, ts("2024-01-03 10:00:00"), 6L, "A"), (3L, ts("2024-01-03 11:00:00"), 7L, "C"),
      (4L, ts("2024-01-10 10:00:00"), 8L, "A"), (4L, ts("2024-01-10 11:00:00"), 9L, "B"),
      (5L, ts("2024-01-10 10:00:00"), 10L, "A"), (5L, ts("2024-01-10 11:00:00"), 11L, "C"),
      (6L, ts("2024-01-10 10:00:00"), 12L, "Z"), (6L, ts("2024-01-10 11:00:00"), 13L, "A")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val r = EventAnalytics.nextEventAccuracy(ev, "user_id", "ts", "event_id",
      "event_type", cutoff = "2024-01-10").head()
    // 3 test transitions; Z unseen -> covered 2; A predicts B -> 1 correct
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((3L, 2L, 1L)))
    assert(math.abs(r.getDouble(3) - 1.0 / 3.0) < 1e-12)
    assert(math.abs(r.getDouble(4) - 0.5) < 1e-12)
    // tie-break: train with A->B once, A->C once -> predict B (smallest)
    val tie = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "A"), (1L, ts("2024-01-01 11:00:00"), 2L, "B"),
      (2L, ts("2024-01-02 10:00:00"), 3L, "A"), (2L, ts("2024-01-02 11:00:00"), 4L, "C"),
      (3L, ts("2024-01-10 10:00:00"), 5L, "A"), (3L, ts("2024-01-10 11:00:00"), 6L, "B")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val t = EventAnalytics.nextEventAccuracy(tie, "user_id", "ts", "event_id",
      "event_type", cutoff = "2024-01-10").head()
    assert(t.getLong(2) === 1L, "tie must resolve to B, matching the test row")
  }

  test("rfmSegments: exact rank tiles, higher=better, label ladder") {
    // 10 customers, one order each except ids 1-2 (3 orders). Recency
    // spreads over distinct days so ranks are unambiguous.
    val rows = (1L to 10L).flatMap { id =>
      val n = if (id <= 2) 3 else 1
      (1 to n).map(k => (id, ts(f"2024-01-${id + 10}%02d 10:00:00"),
        id.toDouble * 100 + k))
    }
    val df = rows.toDF("cust", "ots", "price")
    val out = EventAnalytics.rfmSegments(df, "cust", "ots", "price",
        asOf = "2024-02-01", tiles = 5)
      .orderBy("id").collect()
    assert(out.length === 10)
    val byId = out.map(r => r.getLong(0) -> r).toMap
    // id=10 ordered most recently (Jan 21) -> top recency tile
    assert(byId(10L).getInt(4) === 5, "most recent customer gets r_score 5")
    assert(byId(1L).getInt(4) === 1, "least recent customer gets r_score 1")
    // freq: ids 1,2 have 3 orders, everyone else 1 -> they take the top tiles
    assert(Seq(1L, 2L).map(byId(_).getInt(5)).min >= 4)
    // monetary ascends with id (price = id*100*count-ish); id 10 high tile
    assert(byId(10L).getInt(6) === 4 || byId(10L).getInt(6) === 5)
    // tile balance: exact formula puts 2 customers in each of 5 tiles
    val fScores = out.map(_.getInt(5)).groupBy(identity).view.mapValues(_.length)
    assert(fScores.values.toSet === Set(2), s"unbalanced tiles: $fScores")
    // labels come from the documented CASE ladder
    val seg1 = byId(1L).getString(7)
    assert(seg1 === "at_risk", s"id1 (old but frequent) -> at_risk, got $seg1")
    // partitioning invariance: same result from a different layout
    val out2 = EventAnalytics.rfmSegments(df.repartition(7), "cust", "ots",
        "price", asOf = "2024-02-01", tiles = 5)
      .orderBy("id").collect()
    assert(out.map(_.toString).toSeq === out2.map(_.toString).toSeq)
  }

  test("transitionEntropy: hand-checked H and perplexity; deterministic " +
      "state with one successor scores exactly 0") {
    def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000L)
    // user 1: A,B,A,C → A→B, B→A, A→C; user 2: A,B → A→B
    val rows = Seq(
      (1L, ts(0), 0L, "A"), (1L, ts(1), 1L, "B"),
      (1L, ts(2), 2L, "A"), (1L, ts(3), 3L, "C"),
      (2L, ts(0), 10L, "A"), (2L, ts(1), 11L, "B"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = EventAnalytics.transitionEntropy(rows, "user_id", "ts",
        "event_id", "event_type")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // A: counts {B:2, C:1}, H = −(2/3)ln(2/3) − (1/3)ln(1/3)
    //   = 0.27031007 + 0.36620410 (each term rounded to 8 decimals)
    val (na, fa, ha, pa) = got("A")
    assert(na === 3L && fa === 2L)
    assert(math.abs(ha - 0.63651417) < 1e-8, s"H(A) = $ha")
    assert(math.abs(pa - math.exp(0.63651417)) < 1e-5)
    val (nb, fb, hb, pb) = got("B")
    assert(nb === 1L && fb === 1L && hb === 0.0 && pb === 1.0)
  }

  test("bradleyTerry: two-item strengths converge to the win-ratio; " +
      "never-winning item goes to zero") {
    val prefs = Seq((1L, 2L, 2L), (2L, 1L, 1L), (1L, 3L, 1L))
      .toDF("w", "l", "n")
    val got = EventAnalytics.bradleyTerry(prefs, "w", "l", "n", iters = 12)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    // MLE: W_1 = 3 = 3w1/(w1+w2) + 1 (the sure win vs the zero item)
    // ⇒ w1 = 2·w2 exactly at the fixpoint; MM converges linearly
    assert(got(1L)._1 === 3L)
    assert(math.abs(got(1L)._2 / got(2L)._2 - 2.0) < 1e-4,
      s"strength ratio: $got")
    assert(got(3L) === ((0L, 0.0)), s"loser strength: ${got(3L)}")
  }

  test("dtwPairs: hand-checked DP on a 2x2 case; identical shifted " +
      "series beat misaligned correlation") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    val rows = Seq(
      ("a", ts(1), 1.0), ("a", ts(2), 3.0),
      ("b", ts(1), 2.0), ("b", ts(2), 4.0),
      // c = a shifted one day (same shape): DTW should be small
      ("c", ts(1), 1.0), ("c", ts(2), 1.0), ("c", ts(3), 3.0))
      .toDF("series", "ts", "value")
    val got = EventAnalytics.dtwPairs(rows, "ts", "series", "value")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(4))
      .toMap
    // a=[100,300], b=[200,400]: row1=[100,200]; y=400: [100+300,
    // |300-400|+min(200,100,400)] = [400, 200] → 200
    assert(got(("a", "b")) === 200L, s"dtw(a,b): $got")
    // a=[100,300] vs c=[100,100,300]: warping absorbs the shift → 0
    assert(got(("a", "c")) === 0L, s"dtw(a,c): $got")
  }

  test("copelandScores: head-to-head majorities, exact ties score 0, " +
      "one-directional pairs count") {
    // 1 beats 2 (2:1); 1 ties 3 (1:1); 2 beats 3 (1:0, one-directional)
    val prefs = Seq((1L, 2L, 2L), (2L, 1L, 1L), (1L, 3L, 1L), (3L, 1L, 1L),
      (2L, 3L, 1L)).toDF("w", "l", "n")
    val got = EventAnalytics.copelandScores(prefs, "w", "l", "n")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      1L -> ((1L, 0L, 1L)),  // beats 2, ties 3
      2L -> ((1L, 1L, 0L)),  // beats 3, loses to 1
      3L -> ((0L, 1L, -1L))), // ties 1, loses to 2
      s"copeland wrong: $got")
  }

  test("welchTTest: hand-checked t and Welch-Satterthwaite df") {
    // A: 1,2,3 (mean 2, var 1); B: 2,4,6 (mean 4, var 4)
    // se² = 1/3 + 4/3 = 5/3; t = −2/√(5/3) = −1.549193
    // df = (5/3)² / ((1/9)/2 + (16/9)/2) = 450/153 = 2.9412
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 4.0), ("b", 6.0)).toDF("variant", "value")
    val r = EventAnalytics.welchTTest(df, "variant", "value").head()
    assert(r.getString(0) === "a" && r.getString(1) === "b")
    assert(r.getLong(2) === 3L && r.getLong(3) === 3L)
    assert(r.getDouble(4) === 6.0 && r.getDouble(5) === 12.0)
    assert(math.abs(r.getDouble(6) - (-1.549193)) < 1e-6)
    assert(math.abs(r.getDouble(7) - 2.9412) < 1e-4)
  }

  test("burstiness: periodic user scores -1, bursty user positive, " +
      "degenerate zero-gap user defined as 0") {
    def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000L)
    val rows =
      // user 1: perfectly periodic, gaps 10s,10s,10s -> B = -1
      Seq(0L, 10L, 20L, 30L).zipWithIndex.map { case (t, i) => (1L, ts(t), i.toLong) } ++
      // user 2: gaps 1s,1s,58s -> B ≈ 0.146577 (hand-computed)
      Seq(0L, 1L, 2L, 60L).zipWithIndex.map { case (t, i) => (2L, ts(t), 10L + i) } ++
      // user 3: all events at the same instant -> sum_us = 0 -> B = 0
      Seq(0L, 0L, 0L).zipWithIndex.map { case (t, i) => (3L, ts(t), 20L + i) } ++
      // user 4: a single event -> no gaps -> filtered out
      Seq((4L, ts(0L), 30L))
    val df = rows.toDF("user_id", "ts", "event_id")
    val got = EventAnalytics.burstiness(df, "user_id", "ts", "event_id")
      .orderBy("user_id").collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(got(0).getDouble(3) === -1.0)
    assert(math.abs(got(1).getDouble(3) - 0.146577) < 1e-6)
    assert(got(2).getDouble(3) === 0.0)
    assert(got(0).getLong(1) === 3L && got(0).getLong(2) === 30L * 1000000L)
  }
}
