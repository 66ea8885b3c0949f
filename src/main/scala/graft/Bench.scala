package graft
import org.apache.spark.sql.SparkSession

/** Driver benchmark: every registered query at the given SF, best-of-2.
  *
  * Measurement integrity (round-11 redesign): the two attempts of each
  * query run in two SEPARATED FULL SWEEPS (pass A over all queries in
  * sorted order, then pass B over all queries), not back-to-back. A
  * sustained co-tenant load window on this shared host previously
  * contaminated BOTH attempts of a contiguous alphabetical block
  * (r6: 319s recorded vs 229s steady; r10: 404s recorded vs ~259s
  * adjudicated, x51-x60/x123-x133 inflated 7-25x in both attempts).
  * With ~288 queries per sweep the two attempts of any query are
  * separated by a full sweep (~2-7 min of wall time), so one load
  * window can no longer hit both. The 1-minute system load average is
  * recorded beside each timing so contaminated entries are
  * self-documenting in "raw".
  */
object Bench {
  private val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
  /** 1-minute load average at measurement time; -1.0 if unavailable. */
  private def loadAvg(): Double = {
    val la = osBean.getSystemLoadAverage
    if (la.isNaN) -1.0 else math.round(la * 100) / 100.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (codegen compiler, shuffle machinery, parquet reader)
    // so the first measured query doesn't absorb ~6s of JVM startup.
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").groupBy("r_name").count().collect()
    // Warm the STORAGE cache: stream every fixture file's raw bytes once so
    // the measured numbers are compute, not the virtualized disk's
    // cold-read luck of the draw (measured: an evicted page cache turns a
    // 1.5s query into 90s on this host). Query- and frame-level caching
    // stay OFF — every query still plans, scans, and shuffles from scratch.
    graft.util.Fs.warmStorage(sfDir)

    val names = SparkEntry.queries.keys.toSeq.sorted
    // One timed execution: (seconds or -1 on failure, load average at start).
    // The cache clear after each query drops any persisted frames a query
    // left behind so later queries aren't taxed by someone else's cache.
    def once(name: String): (Double, Double) = {
      val la = loadAvg()
      val t0 = System.nanoTime()
      val ok = try { SparkEntry.queries(name)(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      (if (ok) dt else -1.0, la)
    }
    // Sweep A: every query once, sorted order. Sweep B: every query again.
    // No result reuse between sweeps — the cache clear means both runs
    // plan, scan and shuffle from scratch; only OS page cache (pre-warmed
    // anyway) and JIT/codegen state carry over, which is exactly the
    // steady state the recorded min should reflect.
    val passA = names.map(n => n -> once(n)).toMap
    val passB = names.map { n =>
      // don't burn a second sweep on a query whose first run failed
      n -> (if (passA(n)._1 < 0) (-1.0, -1.0) else once(n))
    }.toMap
    val results = names.map { n =>
      val (a, la) = passA(n); val (b, lb) = passB(n)
      // a failed FIRST run records -1 (broken query); a failed RERUN
      // falls back to the first timing but stays visible in "raw" below
      val best = if (a < 0) a else if (b < 0) a else math.min(a, b)
      (n, best, a, b, la, lb)
    }
    val qs = results.map { case (k, v, _, _, _, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // both raw executions per query with the 1-min load average recorded at
    // each attempt's start ([secA, secB, loadA, loadB]) — a blown timing
    // with load >> cpus is machine contamination, not a code regression
    val raw = results.map { case (k, _, a, b, la, lb) =>
      s"\"" + k + s"\":[$a,$b,$la,$lb]"
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val perQueryLine =
      s"""{"metric":"total","value":$total,"unit":"sec","method":"best_of_2_swept","queries":$qs,"sf":"$sfDir"}"""
    println(perQueryLine)
    // The driver captures only the TAIL of stdout; with ~290 queries the
    // line above exceeds that window and the leading total is lost. Emit a
    // compact total-only line LAST so a truncated capture still parses, and
    // persist the full record beside the fixtures-independent cwd.
    println(s"""{"metric":"total","value":$total,"unit":"sec","method":"best_of_2_swept","nqueries":${results.size},"sf":"$sfDir"}""")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("bench.json"),
      perQueryLine.dropRight(1) + s""","raw":$raw}""" + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
