package graft.x

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Column-level data profiling: per-column null counts, cardinality, and
  * min/max in a single aggregation job.
  *
  * The profile is the first step of every onboarding/validation pipeline
  * (it feeds the null-key and threshold validators' configuration), so it
  * has to touch the table once: all per-column statistics are computed in
  * ONE `agg()` — one scan, one reduce — then unpivoted driver-free with
  * `stack`. Min/max are surfaced as strings so one schema fits every
  * column type.
  *
  * Cardinality: `exact = true` uses `COUNT(DISTINCT c)` per column, which
  * Catalyst plans via Expand (input duplicated per distinct aggregate) —
  * fine for profiling a sample, wrong for 100 TB. `exact = false` switches
  * to HLL++ `approx_count_distinct`, keeping the whole profile a single
  * streaming pass with constant memory per column.
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      val nd = if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))
      Seq(
        count(col(c)).as(s"${c}__nn"),
        (count(lit(1)) - count(col(c))).as(s"${c}__nulls"),
        nd.as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `${c}__nn`, `${c}__nulls`, `${c}__nd`, `${c}__min`, `${c}__max`"
    }.mkString(", ")
    one.select(expr(
      s"stack(${cols.size}, $stackArgs) AS " +
        "(column_name, non_null, nulls, n_distinct, min_value, max_value)"))
  }

  /** Pairwise Pearson correlations from EXACT integer moments: values
    * quantize to `scale` decimals, every moment (n, Σx, Σxy, Σx²)
    * accumulates as an exact DECIMAL(38,0) integer, and only the final
    * correlation does float math — identical exact inputs make the
    * result bit-reproducible across partitionings, retries, and engines
    * (a running float `corr` differs in low bits by reduction order).
    * Same design as the anomaly z²-test: push exactness through the
    * distributed part, spend IEEE ops once at the end.
    *
    * One scan, one reduce: all k(k+1)/2 moments ride a single `agg`, so
    * profiling correlations at 100 TB costs one pass regardless of how
    * many pairs are requested. Headroom: |x·10^scale| up to ~1e9 keeps
    * Σxy under 1e38 for ~1e19 rows. */
  def correlationMatrix(df: DataFrame, cols: Seq[String], scale: Int = 2): DataFrame = {
    require(cols.size >= 2, "correlation needs at least two columns")
    val d0 = "decimal(38,0)"
    val factor = math.pow(10, scale).toLong
    val ints = cols.map(c =>
      (col(c).cast(s"decimal(18,$scale)") * factor).cast(d0).as(s"__i_$c"))
    val pairs = for (i <- cols.indices; j <- i until cols.size) yield (cols(i), cols(j))
    val aggs =
      count(lit(1)).cast(d0).as("__n") +:
        (cols.map(c => sum(col(s"__i_$c")).cast(d0).as(s"__s_$c")) ++
          pairs.map { case (a, b) =>
            sum(col(s"__i_$a") * col(s"__i_$b")).cast(d0).as(s"__p_${a}_$b") })
    val m = df.select(ints: _*).agg(aggs.head, aggs.tail: _*)
    val corrExprs = pairs.filter { case (a, b) => a != b }.map { case (a, b) =>
      s"""'$a', '$b',
          ROUND(CAST(__n * `__p_${a}_$b` - `__s_$a` * `__s_$b` AS DOUBLE) /
            (SQRT(CAST(__n * `__p_${a}_$a` - `__s_$a` * `__s_$a` AS DOUBLE)) *
             SQRT(CAST(__n * `__p_${b}_$b` - `__s_$b` * `__s_$b` AS DOUBLE))), 6)"""
    }
    m.select(expr(
      s"stack(${corrExprs.size}, ${corrExprs.mkString(", ")}) AS (col_a, col_b, corr)"))
  }

  /** Per-group z-score standardization — the feature-normalization step
    * of an ML-prep pipeline ((x − μ_g)/σ_g per group g), built on the
    * same exact-moments design as [[correlationMatrix]]: group moments
    * (n, Σx, Σx²) accumulate as exact DECIMAL(38,0) integers via window
    * aggregates (one shuffle on the group key, no join-back, no second
    * scan) and each row's z spends IEEE ops once, in a fixed sequence —
    * so scores can't wobble across partitionings or engines. Groups with
    * n < 2 or zero variance get NULL (a 0/0 z-score is noise, not data).
    * Appends `<valueCol>_z`. */
  def standardize(df: DataFrame, valueCol: String, groupCols: Seq[String],
      scale: Int = 4): DataFrame = {
    val d0 = "decimal(38,0)"
    val factor = math.pow(10, scale).toLong
    val xi = (col(valueCol).cast(s"decimal(18,$scale)") * factor).cast(d0)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(groupCols.map(col): _*)
    val n = count(lit(1)).over(w).cast(d0)
    val s = sum(xi).over(w).cast(d0)
    val q = sum(xi * xi).over(w).cast(d0)
    val mSq = n * q - s * s // n² · Σ(x−μ)² ≥ 0, exact
    val z = (n * xi - s).cast("double") /
      sqrt(mSq.cast("double") * (n.cast("double") / (n - 1).cast("double")))
    df.withColumn(s"${valueCol}_z", when(n > 1 && mSq > 0, z))
  }

  /** Winsorize: clip a numeric column at its exact interpolated
    * `[pLo, pHi]` quantiles — the standard outlier-capping step before
    * scaling/aggregating heavy-tailed metrics. Adds `<column>_w`, leaves
    * the original in place.
    *
    * Shape: the two quantiles aggregate to ONE row that broadcasts back
    * onto the scan; the clip is a narrow projection, so the table is
    * touched twice (once sorted for the exact quantile, once to clip).
    * At 100 TB swap the exact `percentile` for `approx_percentile` —
    * identical plan shape, sketch-mergeable single pass, and a clip
    * threshold off by a sketch-epsilon only moves values that sat within
    * epsilon of the cap. */
  def winsorize(df: DataFrame, column: String, pLo: Double, pHi: Double,
      exact: Boolean = true): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, "need 0 <= pLo < pHi <= 1")
    val fn = if (exact) "percentile" else "approx_percentile"
    val q = df.agg(
      expr(s"$fn($column, $pLo)").cast("double").as("__lo"),
      expr(s"$fn($column, $pHi)").cast("double").as("__hi"))
    df.crossJoin(broadcast(q))
      .withColumn(s"${column}_w",
        least(greatest(col(column).cast("double"), col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }

  /** Fixed-domain equi-width histogram of a numeric column. The domain
    * `[lo, hi]` is DECLARED by the caller rather than derived from the
    * data, so the histogram is one scan with map-side partial counts — a
    * data-derived domain would cost a min/max pre-pass (and make the
    * bucket edges drift run-to-run on growing tables). Values outside
    * the domain are dropped; `hi` itself clamps into the last bucket.
    * Output rows: bucket index, [bucket_lo, bucket_hi) edges, count —
    * at most `nBuckets` rows regardless of input size. */
  def histogram(df: DataFrame, column: String, nBuckets: Int,
      lo: Double, hi: Double): DataFrame = {
    require(nBuckets > 0 && hi > lo, "histogram needs nBuckets > 0 and hi > lo")
    val v = col(column).cast("double")
    val idx = least(
      greatest(floor((v - lit(lo)) * lit(nBuckets.toDouble) / lit(hi - lo)), lit(0.0)),
      lit((nBuckets - 1).toDouble)).cast("int")
    val width = (hi - lo) / nBuckets
    df.filter(v.isNotNull && v >= lo && v <= hi)
      .groupBy(idx.as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("bucket"),
        (col("bucket") * lit(width) + lit(lo)).as("bucket_lo"),
        ((col("bucket") + 1) * lit(width) + lit(lo)).as("bucket_hi"),
        col("cnt").cast("long").as("cnt"))
  }

  /** Robust per-group outlier summary: median / MAD instead of mean /
    * stddev. The z²-test ([[graft.x.EventAnalytics.dailyAnomalies]]) and
    * [[standardize]] both break down when the group ITSELF is polluted —
    * outliers inflate the moments that define "outlier" (masking). The
    * median and the median-absolute-deviation have a 50% breakdown
    * point: half a group can be garbage and the fence still stands.
    * Flag rule: |x − median| > z · 1.4826 · MAD (1.4826 = 1/Φ⁻¹(3/4),
    * the consistency constant that makes MAD estimate σ under
    * normality). A degenerate group (MAD = 0) flags every value off the
    * median, the conventional strict reading.
    *
    * Shape: exact interpolated percentiles aggregate the group to ONE
    * row; the medians/MADs join back group-keyed (group cardinality is
    * small by nature — broadcast) and the flag is a narrow projection.
    * Three passes over the column, each a plain group agg — no window
    * over the raw rows, no sort of the 100 TB side beyond the
    * percentile's own per-group collection. */
  def robustOutliers(df: DataFrame, valueCol: String, groupCols: Seq[String],
      z: Double = 3.0): DataFrame = {
    require(groupCols.nonEmpty, "robustOutliers needs at least one group column")
    val gc = groupCols.map(col)
    val v = col(valueCol).cast("double")
    val med = df.groupBy(gc: _*).agg(percentile(v, lit(0.5)).as("med"))
    val mad = df.join(med, groupCols)
      .groupBy(gc: _*)
      .agg(percentile(abs(v - col("med")), lit(0.5)).as("mad"))
    val fence = lit(z) * lit(1.4826) * col("mad")
    df.join(med, groupCols).join(mad, groupCols)
      .groupBy((gc :+ col("med") :+ col("mad")): _*)
      .agg(count(lit(1)).as("n"),
        sum(when(abs(v - col("med")) > fence, 1L).otherwise(0L)).as("n_outliers"))
      .select(gc ++ Seq(col("med"), col("mad"), col("n"), col("n_outliers")): _*)
  }

  /** Exact weighted quantile per group: the smallest value v such that
    * the cumulative weight of rows ≤ v reaches q = qNum/qDen of the
    * group's total weight — weighted median (1/2), token-budget P90
    * (9/10), etc. The weighted form is what corpus work actually needs:
    * "the median document BY TOKEN MASS" is not the median document.
    *
    * The quantile fraction is a RATIONAL, and the reach test is
    * cross-multiplied (`cum·qDen ≥ total·qNum`) over integer weights —
    * no float boundary, so the picked value is engine- and
    * layout-invariant even when weights tie at the threshold
    * ([[graft.x.TextAnalysis.gopherQualityFlags]]' discipline applied to
    * quantiles). Ties in the value column are broken by the value itself
    * (cumulative weight accumulates over equal values deterministically
    * via a RANGE frame: all rows of one value share one cumulative sum).
    *
    * Shape: one group-keyed window cumsum over (group, value) — a single
    * shuffle + sort; the pick is `min(value where reached)` in the same
    * aggregation pass. */
  def weightedQuantile(df: DataFrame, valueCol: String, weightCol: String,
      groupCols: Seq[String], qNum: Long = 1, qDen: Long = 2): DataFrame = {
    require(groupCols.nonEmpty, "weightedQuantile needs a group column")
    require(qNum >= 0 && qDen > 0 && qNum <= qDen,
      s"quantile $qNum/$qDen out of [0, 1]")
    val gc = groupCols.map(col)
    val wTotal = Window.partitionBy(gc: _*)
    // RANGE frame: equal values share ONE cumulative weight, so the reach
    // test cannot depend on intra-value row order
    val wCum = Window.partitionBy(gc: _*).orderBy(col(valueCol))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    df.select((gc :+ col(valueCol) :+ col(weightCol).cast("long").as("__w")): _*)
      .withColumn("__cum", sum(col("__w")).over(wCum))
      .withColumn("__tot", sum(col("__w")).over(wTotal))
      .filter(col("__cum") * qDen >= col("__tot") * qNum)
      .groupBy(gc: _*)
      .agg(min(col(valueCol)).as("wq"), max(col("__tot")).cast("long").as("total_weight"))
  }

  /** Theil–Sen robust trend: the MEDIAN of all pairwise slopes
    * `(y_j−y_i)/(x_j−x_i)` per group — a 29.3%-breakdown estimator that
    * shrugs off the outlier days that drag OLS ([[trend]]) around; the
    * robust half of the same question [[robustOutliers]] answers for
    * levels. Pairs explode within each group, so cost is Σ|group|²:
    * right for grouped SERIES (days, versions — bounded cardinality per
    * group), not for raw-event groups; the require below guards the
    * contract.
    *
    * Each slope is ONE IEEE division of exact integer differences
    * (deterministic on any engine); the median picks the ⌈m/2⌉-th slope
    * by (value, i, j) total order — an exact selection, replayable in
    * SQL. Equal-x pairs are excluded (vertical slopes). */
  def theilSen(df: DataFrame, xCol: String, yCol: String,
      groupCols: Seq[String], maxGroupRows: Int = 10000): DataFrame = {
    require(groupCols.nonEmpty, "theilSen needs at least one group column")
    val gc = groupCols.map(col)
    val t = df.select((gc :+ col(xCol).cast("long").as("__x")
      :+ col(yCol).cast("long").as("__y")): _*)
    // the quadratic guard runs BEFORE the pair join: groups past the cap
    // never explode (they are excluded, loudly visible via the missing
    // output row — series-shaped groups stay far below it)
    val small = t.join(broadcast(t.groupBy(gc: _*).agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxGroupRows).select(gc: _*)), groupCols)
    val a = small.toDF(small.columns.toIndexedSeq.map(c => if (c.startsWith("__")) c + "a" else c): _*)
    val b = small.toDF(small.columns.toIndexedSeq.map(c => if (c.startsWith("__")) c + "b" else c): _*)
    val pairs = a.join(b, groupCols)
      .filter(struct(col("__xa"), col("__ya")) < struct(col("__xb"), col("__yb")))
      .filter(col("__xa") =!= col("__xb"))
      .withColumn("__s", (col("__yb") - col("__ya")).cast("double") /
        (col("__xb") - col("__xa")).cast("double"))
    val w = Window.partitionBy(gc: _*)
      .orderBy(col("__s"), col("__xa"), col("__ya"), col("__xb"), col("__yb"))
    pairs
      .withColumn("__r", row_number().over(w))
      .withColumn("__m", count(lit(1)).over(Window.partitionBy(gc: _*)))
      .filter(col("__r") * 2 === col("__m") || col("__r") * 2 === col("__m") + 1)
      .groupBy(gc: _*)
      .agg(min(col("__s")).as("ts_slope"), max(col("__m")).cast("long").as("n_pairs"))
  }

  /** Functional-dependency violation profile over candidate
    * determinant→dependent column pairs (the Metanome/data-profiling
    * check "does A determine B in this load"): per pair, the number of
    * determinant keys, how many of them map to >1 distinct dependent
    * value, and the total excess values — `violating_keys = 0` means the
    * FD holds exactly. The first integrity check to run on a fresh feed:
    * a violated expected FD (order → customer, SKU → brand) is an
    * upstream join bug surfacing as data.
    *
    * NULL dependents are ignored (SQL COUNT(DISTINCT) semantics on both
    * engines); a NULL determinant forms its own key group. Each pair is
    * one (determinant)-keyed aggregate with map-side partials collapsing
    * to ONE row — pairs are independent jobs over the same scan, and all
    * outputs are integers (engine-invariant). */
  def functionalDependencies(df: DataFrame,
      pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "functionalDependencies needs at least one pair")
    pairs.map { case (aCol, bCol) =>
      df.groupBy(col(aCol).as("__k"))
        .agg(countDistinct(col(bCol)).as("__nd"))
        .agg(count(lit(1)).as("__nk"),
          sum(when(col("__nd") > 1, 1L).otherwise(0L)).as("__vk"),
          sum(greatest(col("__nd") - 1, lit(0L))).as("__ev"))
        .select(lit(aCol).as("determinant"), lit(bCol).as("dependent"),
          col("__nk").cast("long").as("n_keys"),
          col("__vk").cast("long").as("violating_keys"),
          col("__ev").cast("long").as("excess_values"),
          (col("__vk") === 0).as("holds"))
    }.reduce(_ unionAll _)
  }

  /** Per-group ordinary-least-squares trend: slope and intercept of
    * integer-valued `yCol` against integer-valued `xCol` (day index,
    * version number, epoch…) via the closed form
    *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    * with every moment carried as DECIMAL(38,0) — the products of 1e13-
    * scale daily totals and epoch-day indices stay exact where double
    * partial sums would drift by reduction order ([[correlationMatrix]]'s
    * discipline pointed at trend detection: "is this source growing,
    * rotting, or flat"). IEEE math happens exactly twice per group, on
    * exact operands, in a fixed expression shape — replayable on any
    * engine. Groups with < 2 points or zero x-variance yield NULL slope.
    *
    * Shape: ONE aggregation with map-side partials; all four moments ride
    * the same shuffle. Output is group-cardinality — driver-scale. */
  def trend(df: DataFrame, xCol: String, yCol: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "trend needs at least one group column")
    val d38 = "decimal(38,0)"
    val x = col(xCol).cast(d38)
    val y = col(yCol).cast(d38)
    val gc = groupCols.map(col)
    df.groupBy(gc: _*)
      .agg(count(lit(1)).cast(d38).as("__n"), sum(x).as("__sx"),
        sum(y).as("__sy"), sum(x * y).cast(d38).as("__sxy"),
        sum(x * x).cast(d38).as("__sxx"))
      .withColumn("__num", (col("__n") * col("__sxy") - col("__sx") * col("__sy"))
        .cast(d38))
      .withColumn("__den", (col("__n") * col("__sxx") - col("__sx") * col("__sx"))
        .cast(d38))
      .withColumn("slope", when(col("__den") =!= 0,
        col("__num").cast("double") / col("__den").cast("double")))
      .withColumn("intercept",
        (col("__sy").cast("double") - col("slope") * col("__sx").cast("double")) /
          col("__n").cast("double"))
      .select(gc ++ Seq(col("__n").cast("long").as("n"), col("slope"),
        col("intercept")): _*)
  }

  /** Per-group TWO-feature ordinary least squares — [[trend]] widened to
    * y = b0 + b1·x1 + b2·x2 via Cramer's rule on the 3×3 normal
    * equations. The nine moments (n, Σx1, Σx2, Σy, Σx1², Σx1x2, Σx2²,
    * Σx1y, Σx2y, plus Σy² for R²) are carried as exact DECIMAL(38,0)
    * over integer-valued inputs, so the single shuffle is
    * association-free; the cofactor determinants are then a FIXED
    * double expression over those exact scalars — the repo's "IEEE on
    * exact operands, fixed shape" replay contract. Groups that are
    * rank-deficient (det = 0, e.g. collinear features) or have < 3
    * points yield NULL coefficients rather than garbage.
    *
    * Two features is the honest exact-replay ceiling: the k-feature
    * generalization needs a Gram-matrix factorization whose pivot
    * order is engine-specific — that path belongs in a numeric
    * library, not an oracle-replayable engine op.
    *
    * Shape: ONE aggregation, map-side partials, all ten moments on the
    * same shuffle; output is group-cardinality. */
  def ols2(df: DataFrame, x1Col: String, x2Col: String, yCol: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "ols2 needs at least one group column")
    val d38 = "decimal(38,0)"
    val x1 = col(x1Col).cast(d38)
    val x2 = col(x2Col).cast(d38)
    val y = col(yCol).cast(d38)
    val gc = groupCols.map(col)
    val m = df.groupBy(gc: _*)
      .agg(count(lit(1)).cast(d38).as("__n"),
        sum(x1).as("__s1"), sum(x2).as("__s2"), sum(y).as("__sy"),
        sum(x1 * x1).cast(d38).as("__s11"),
        sum(x1 * x2).cast(d38).as("__s12"),
        sum(x2 * x2).cast(d38).as("__s22"),
        sum(x1 * y).cast(d38).as("__s1y"),
        sum(x2 * y).cast(d38).as("__s2y"),
        sum(y * y).cast(d38).as("__syy"))
    // fixed-shape IEEE over exact operands; identical text in the oracle
    val dbl = Seq("__n", "__s1", "__s2", "__sy", "__s11", "__s12", "__s22",
      "__s1y", "__s2y", "__syy")
      .foldLeft(m) { (d, c) => d.withColumn(c + "d", col(c).cast("double")) }
    dbl
      .withColumn("__det", expr(
        "__nd * (__s11d * __s22d - __s12d * __s12d) " +
          "- __s1d * (__s1d * __s22d - __s12d * __s2d) " +
          "+ __s2d * (__s1d * __s12d - __s11d * __s2d)"))
      .withColumn("b0", expr(
        "CASE WHEN __det <> 0.0 AND __nd >= 3.0 THEN " +
          "(__syd * (__s11d * __s22d - __s12d * __s12d) " +
          "- __s1d * (__s1yd * __s22d - __s12d * __s2yd) " +
          "+ __s2d * (__s1yd * __s12d - __s11d * __s2yd)) / __det END"))
      .withColumn("b1", expr(
        "CASE WHEN __det <> 0.0 AND __nd >= 3.0 THEN " +
          "(__nd * (__s1yd * __s22d - __s12d * __s2yd) " +
          "- __syd * (__s1d * __s22d - __s12d * __s2d) " +
          "+ __s2d * (__s1d * __s2yd - __s1yd * __s2d)) / __det END"))
      .withColumn("b2", expr(
        "CASE WHEN __det <> 0.0 AND __nd >= 3.0 THEN " +
          "(__nd * (__s11d * __s2yd - __s1yd * __s12d) " +
          "- __s1d * (__s1d * __s2yd - __s1yd * __s2d) " +
          "+ __syd * (__s1d * __s12d - __s11d * __s2d)) / __det END"))
      .withColumn("r2", expr(
        "CASE WHEN __det <> 0.0 AND __nd >= 3.0 " +
          "AND (__syyd - __syd * __syd / __nd) <> 0.0 THEN " +
          "1.0 - (__syyd - b0 * __syd - b1 * __s1yd - b2 * __s2yd) " +
          "/ (__syyd - __syd * __syd / __nd) END"))
      .select(gc ++ Seq(col("__n").cast("long").as("n"),
        round(col("b0"), 6).as("b0"), round(col("b1"), 6).as("b1"),
        round(col("b2"), 6).as("b2"), round(col("r2"), 6).as("r2")): _*)
  }

  /** Per-group Gini concentration coefficient over non-negative integer
    * values (cents, tokens, bytes): the rank formula
    *   G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n
    * over values sorted ascending — revenue concentration per segment,
    * token-mass concentration per source, the inequality readout behind
    * "is this corpus dominated by a handful of domains".
    *
    * Within equal values the rank assignment is arbitrary; Σ i·xᵢ is
    * invariant under permutations inside a tie group, so the statistic
    * is well-defined and the (value, id) tie-break exists purely to
    * pin the engine's total order. Ranks come from the two-phase
    * range-partition scheme ([[Dedup.globalRowNumber]] GENERALIZED to
    * per-group carry-ins: per-(group, partition) counts window over the
    * parts-sized frame, broadcast back), so no group ever collapses
    * onto one task no matter how large. Moments are exact DECIMALs; G
    * is one fixed-shape double expression per group.
    *
    * Requires non-negative values (negative mass makes G meaningless);
    * groups with zero total yield NULL. */
  def gini(df: DataFrame, groupCols: Seq[String], valueCol: String,
      idCol: String,
      staging: graft.util.Staging = graft.util.Staging.LocalCheckpoint): DataFrame = {
    require(groupCols.nonEmpty, "gini needs at least one group column")
    val gc = groupCols.map(col)
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val sortCols = gc ++ Seq(col(valueCol), col(idCol))
    val ranged = staging.stage(
      df.select(gc :+ col(valueCol).cast("long").as("__v") :+
          col(idCol).as("__id"): _*)
        .repartitionByRange(parts, sortCols: _*)
        .withColumn("__pid", spark_partition_id()), "gini-ranged")
    val wOff = org.apache.spark.sql.expressions.Window
      .partitionBy(gc: _*).orderBy("__pid")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val off = ranged.groupBy(gc :+ col("__pid"): _*)
      .agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(sum("__c").over(wOff), lit(0L)))
      .select(gc :+ col("__pid") :+ col("__off"): _*)
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(gc :+ col("__pid"): _*)
      .orderBy(col("__v"), col("__id"))
    ranged.join(broadcast(off), groupCols :+ "__pid")
      .withColumn("__rank", col("__off") + row_number().over(wIn))
      .groupBy(gc: _*)
      .agg(count(lit(1)).cast("decimal(38,0)").as("__n"),
        sum(col("__v").cast("decimal(38,0)")).as("__s"),
        sum((col("__rank") * col("__v")).cast("decimal(38,0)")).as("__rs"))
      .select(gc ++ Seq(col("__n").cast("long").as("n"),
        col("__s").cast("double").as("total"),
        round(when(col("__s") > 0,
          lit(2.0) * col("__rs").cast("double") /
            (col("__n").cast("double") * col("__s").cast("double")) -
            (col("__n").cast("double") + lit(1.0)) / col("__n").cast("double")),
          6).as("gini")): _*)
  }

  /** Exact two-sample Kolmogorov–Smirnov test between the `valueCol`
    * distributions of two groups: D = max_v |F_A(v) − F_B(v)| computed
    * in CROSS-MULTIPLIED integers (max |c_A·n_B − c_B·n_A|, one IEEE
    * division at the end), the location of the maximum gap (smallest
    * value on ties — a total order), and the asymptotic p-value
    * (Smirnov's series, 3 terms, fixed expression shape). The
    * distribution-shift gate for A/B assignment checks, drift
    * monitoring between snapshots, and segment comparison — [[psiDrift]]
    * without the bucketing choice.
    *
    * No single-partition sort exists: per-value counts range-partition
    * by value, cumulate within partitions, and add broadcast
    * per-partition carry-ins — the [[Sampling.tokenBudgetSelect]]
    * parallel-cumsum shape. `valueCol` must be numeric (the tie-break
    * negates it). Output is one row.
    *
    * Shape: one (value) count shuffle, one range shuffle of value-
    * cardinality rows, a parts-sized offset broadcast, one max
    * aggregate. */
  def ksTest(df: DataFrame, valueCol: String, groupCol: String,
      groupA: String, groupB: String,
      staging: graft.util.Staging = graft.util.Staging.LocalCheckpoint): DataFrame = {
    val wanted = df.filter(col(groupCol).isin(groupA, groupB) &&
      col(valueCol).isNotNull)
    val base = wanted.select(col(valueCol).as("__v"),
        when(col(groupCol) === groupA, 1L).otherwise(0L).as("__a"),
        when(col(groupCol) === groupB, 1L).otherwise(0L).as("__b"))
      .groupBy("__v").agg(sum("__a").as("__ca"), sum("__b").as("__cb"))
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = staging.stage(
      base.repartitionByRange(parts, col("__v"))
        .withColumn("__pid", spark_partition_id()), "ks-ranged")
    val wOff = org.apache.spark.sql.expressions.Window.orderBy("__pid")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val off = ranged.groupBy("__pid")
      .agg(sum("__ca").as("__ta"), sum("__cb").as("__tb"))
      .withColumn("__offa", coalesce(sum("__ta").over(wOff), lit(0L)))
      .withColumn("__offb", coalesce(sum("__tb").over(wOff), lit(0L)))
      .select("__pid", "__offa", "__offb")
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy("__v")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val totals = base.agg(sum("__ca").as("__na"), sum("__cb").as("__nb"))
    ranged.join(broadcast(off), Seq("__pid"))
      .select(col("__v"),
        (col("__offa") + sum("__ca").over(wIn)).as("__cuma"),
        (col("__offb") + sum("__cb").over(wIn)).as("__cumb"))
      .crossJoin(broadcast(totals))
      .select(col("__v"), col("__na"), col("__nb"),
        abs(col("__cuma") * col("__nb") - col("__cumb") * col("__na"))
          .as("__num"))
      .agg(max(col("__na")).as("__na"), max(col("__nb")).as("__nb"),
        max(col("__num")).as("__dnum"),
        expr("max_by(__v, struct(__num, -__v))").as("ks_at"))
      .select(col("__na").cast("long").as("n_a"),
        col("__nb").cast("long").as("n_b"),
        col("__dnum").cast("long").as("d_num"), col("ks_at"),
        round(col("__dnum").cast("double") /
          (col("__na").cast("double") * col("__nb").cast("double")), 6)
          .as("d_stat"),
        round(least(lit(1.0), greatest(lit(0.0), {
          val d = col("__dnum").cast("double") /
            (col("__na").cast("double") * col("__nb").cast("double"))
          val ne = col("__na").cast("double") * col("__nb").cast("double") /
            (col("__na").cast("double") + col("__nb").cast("double"))
          val lam = (sqrt(ne) + lit(0.12) + lit(0.11) / sqrt(ne)) * d
          lit(2.0) * (exp(lit(-2.0) * lam * lam) - exp(lit(-8.0) * lam * lam)
            + exp(lit(-18.0) * lam * lam))
        })), 6).as("p_approx"))
  }

  /** One-way ANOVA over integer-valued observations: the F statistic
    *   F = (SSB/(g−1)) / (SSW/(n−g))
    * plus effect size η² = SSB/SST — "does the group column explain the
    * metric at all", the first screen before any per-group deep dive.
    * All sums of squares derive from exact DECIMAL(38,0) moments (n,
    * Σx, Σx² per group) on ONE shuffle: SST = Σx² − (Σx)²/n and
    * SSB = Σ_g (Σx_g)²/n_g − (Σx)²/n evaluated as fixed double
    * expressions over the exact scalars (per-group terms quantized
    * DECIMAL(18,8) so the group sum is association-free). Degenerate
    * inputs (g < 2, n ≤ g, SSW = 0) yield NULL F rather than garbage. */
  def anovaF(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val x = col(valueCol).cast(d38)
    val g = df.filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("__g"))
      .agg(count(lit(1)).cast(d38).as("__n"), sum(x).as("__s"),
        sum(x * x).cast(d38).as("__ss"))
    val tot = g.agg(count(lit(1)).cast("long").as("__k"),
      sum("__n").cast(d38).as("__N"), sum("__s").cast(d38).as("__S"),
      sum("__ss").cast(d38).as("__SS"))
    val between = g
      .select(((col("__s").cast("double") * col("__s").cast("double")) /
        col("__n").cast("double")).cast("decimal(38,8)").as("__t"))
      .agg(sum("__t").as("__B"))
    between.crossJoin(broadcast(tot))
      .select(col("__k").as("groups"), col("__N").cast("long").as("n"),
        expr("CAST(__SS AS DOUBLE) - CAST(__S AS DOUBLE) * " +
          "CAST(__S AS DOUBLE) / CAST(__N AS DOUBLE)").as("sst"),
        expr("CAST(__B AS DOUBLE) - CAST(__S AS DOUBLE) * " +
          "CAST(__S AS DOUBLE) / CAST(__N AS DOUBLE)").as("ssb"),
        round(expr(
          "CASE WHEN __k >= 2 AND CAST(__N AS DOUBLE) > CAST(__k AS DOUBLE) " +
            "AND (CAST(__SS AS DOUBLE) - CAST(__B AS DOUBLE)) > 0.0 THEN " +
            "((CAST(__B AS DOUBLE) - CAST(__S AS DOUBLE) * CAST(__S AS DOUBLE) " +
            "/ CAST(__N AS DOUBLE)) / (CAST(__k AS DOUBLE) - 1.0)) / " +
            "((CAST(__SS AS DOUBLE) - CAST(__B AS DOUBLE)) / " +
            "(CAST(__N AS DOUBLE) - CAST(__k AS DOUBLE))) END"), 6).as("f_stat"),
        round(expr(
          "CASE WHEN (CAST(__SS AS DOUBLE) - CAST(__S AS DOUBLE) * " +
            "CAST(__S AS DOUBLE) / CAST(__N AS DOUBLE)) > 0.0 THEN " +
            "(CAST(__B AS DOUBLE) - CAST(__S AS DOUBLE) * CAST(__S AS DOUBLE) " +
            "/ CAST(__N AS DOUBLE)) / (CAST(__SS AS DOUBLE) - " +
            "CAST(__S AS DOUBLE) * CAST(__S AS DOUBLE) / CAST(__N AS DOUBLE)) " +
            "END"), 6).as("eta_sq"))
  }

  /** Cramér's V association between two categorical columns: the
    * chi-square contingency statistic normalized to [0, 1],
    *   V = √(χ² / (n·(min(r,c)−1)))
    * — [[mutualInformation]]'s bounded, units-free sibling (V is
    * comparable ACROSS pairs with different cardinalities, which raw MI
    * is not). Counts exact; each cell's (o−e)²/e runs as one fixed
    * double chain over exact integers quantized to DECIMAL(18,8); χ²
    * and V are single IEEE expressions over the exact sum. Null keys
    * excluded, same contract as MI. */
  def cramersV(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val base = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
    val cells = base.groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__o"))
    val ca = base.groupBy(col(aCol).as("__a")).agg(count(lit(1)).as("__ca"))
    val cb = base.groupBy(col(bCol).as("__b")).agg(count(lit(1)).as("__cb"))
    val n = base.agg(count(lit(1)).as("__n"))
    val dims = ca.agg(count(lit(1)).as("__r"))
      .crossJoin(cb.agg(count(lit(1)).as("__c")))
    // chi2 must include EMPTY cells' (0-e)^2/e = e terms: iterate the
    // full r x c grid (marginal cross join, broadcast one side)
    val grid = ca.crossJoin(broadcast(cb))
      .join(cells, Seq("__a", "__b"), "left")
      .withColumn("__oo", coalesce(col("__o"), lit(0L)))
    val chi = grid.crossJoin(broadcast(n))
      .select((
        {
          val e = col("__ca").cast("double") * col("__cb").cast("double") /
            col("__n").cast("double")
          (col("__oo").cast("double") - e) * (col("__oo").cast("double") - e) / e
        }).cast("decimal(18,8)").as("__t"))
      .agg(coalesce(sum("__t"), lit(0).cast("decimal(18,8)")).as("__chi2"))
    chi.crossJoin(broadcast(n)).crossJoin(broadcast(dims))
      .select(col("__n").cast("long").as("n"),
        col("__r").cast("long").as("rows_dim"),
        col("__c").cast("long").as("cols_dim"),
        round(col("__chi2").cast("double"), 6).as("chi2"),
        round(when(col("__r") >= 2 && col("__c") >= 2,
          sqrt(col("__chi2").cast("double") /
            (col("__n").cast("double") *
              (least(col("__r"), col("__c")).cast("double") - lit(1.0))))),
          6).as("cramers_v"))
  }

  /** Per-group quantile (rank) transform: each row gets
    * q = rank/(n_g + 1) ∈ (0, 1) within its group — the
    * distribution-free feature normalization ([[standardize]]'s robust
    * sibling: immune to outliers and arbitrary monotone warps, the
    * uniform-marginals step of copula preprocessing). Ranks are the
    * (value, id) total order, so ties resolve deterministically and the
    * transform replays on any engine.
    *
    * Same per-group two-phase rank as [[gini]]: range-partition on
    * (group, value, id), per-partition row_number, broadcast per-
    * (group, partition) carry-ins — no group ever sorts on one task. */
  def quantileTransform(df: DataFrame, groupCols: Seq[String],
      valueCol: String, idCol: String,
      staging: graft.util.Staging = graft.util.Staging.LocalCheckpoint): DataFrame = {
    require(groupCols.nonEmpty, "quantileTransform needs at least one group column")
    val gc = groupCols.map(col)
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val sortCols = gc ++ Seq(col(valueCol), col(idCol))
    val ranged = staging.stage(
      df.select(gc :+ col(valueCol).cast("long").as("__v") :+
          col(idCol).as("__id"): _*)
        .repartitionByRange(parts, sortCols: _*)
        .withColumn("__pid", spark_partition_id()), "qt-ranged")
    val wOff = org.apache.spark.sql.expressions.Window
      .partitionBy(gc: _*).orderBy("__pid")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val off = ranged.groupBy(gc :+ col("__pid"): _*)
      .agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(sum("__c").over(wOff), lit(0L)))
      .withColumn("__n", sum("__c").over(
        org.apache.spark.sql.expressions.Window.partitionBy(gc: _*)))
      .select(gc :+ col("__pid") :+ col("__off") :+ col("__n"): _*)
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(gc :+ col("__pid"): _*)
      .orderBy(col("__v"), col("__id"))
    ranged.join(broadcast(off), groupCols :+ "__pid")
      .select(gc :+ col("__id").as(idCol) :+ col("__v").as(valueCol) :+
        round((col("__off") + row_number().over(wIn)).cast("double") /
          (col("__n") + 1L).cast("double"), 6).as("q"): _*)
  }

  /** Isotonic (PAVA) score calibration over `nBins` equal-width score
    * bins: per-bin positive rates projected onto the monotone
    * non-decreasing cone by pool-adjacent-violators (Ayer et al. 1955;
    * Zadrozny & Elkan 2002 for classifier calibration) — the standard
    * way to turn a ranking score into a probability without assuming a
    * parametric link. Violation tests and pools run in EXACT integers
    * (p₁·n₂ > p₂·n₁; pooled blocks keep Σpos/Σn), so the fixpoint — the
    * unique L2 projection, independent of pooling order — replays on
    * any engine; rates spend one IEEE division each at the end.
    *
    * The data-scale work is ONE binned aggregate; PAVA itself runs on
    * the driver over ≤ `nBins` rows (the x171 bounded-driver-scalar
    * pattern — nBins is a parameter, never data). Empty bins don't
    * exist as rows; pooling operates on the occupied bins in order. */
  def isotonicCalibrate(df: DataFrame, scoreCol: String, labelCol: String,
      nBins: Int, lo: Double, hi: Double): DataFrame = {
    require(nBins >= 2 && nBins <= 10000, s"nBins must be in [2,10000], got $nBins")
    require(hi > lo, "isotonicCalibrate needs hi > lo")
    val s = col(scoreCol).cast("double")
    val idx = least(greatest(
      floor((s - lit(lo)) * lit(nBins.toDouble) / lit(hi - lo)), lit(0.0)),
      lit((nBins - 1).toDouble)).cast("long")
    val bins = df.filter(s.isNotNull && s >= lo && s <= hi)
      .groupBy(idx.as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol).cast("boolean"), 1L).otherwise(0L)).as("pos"))
      .orderBy("bin")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // classic stack PAVA, exact-integer violation test
    case class Block(pos: Long, n: Long, bins: List[Long])
    val stack = scala.collection.mutable.ArrayBuffer.empty[Block]
    bins.foreach { case (b, n, p) =>
      stack += Block(p, n, List(b))
      while (stack.size >= 2 && {
        val a = stack(stack.size - 2); val c = stack.last
        a.pos * c.n > c.pos * a.n
      }) {
        val c = stack.remove(stack.size - 1)
        val a = stack.remove(stack.size - 1)
        stack += Block(a.pos + c.pos, a.n + c.n, a.bins ++ c.bins)
      }
    }
    val byBin = stack.flatMap(bl => bl.bins.map(b => b -> ((bl.pos, bl.n)))).toMap
    val rows = bins.map { case (b, n, p) =>
      val (bp, bn) = byBin(b)
      (b, n, p,
        BigDecimal(p.toDouble / n.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(bp.toDouble / bn.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val spark = df.sparkSession
    import spark.implicits._
    rows.toSeq.toDF("bin", "n", "pos", "raw_rate", "iso_rate")
  }

  /** Reliability-diagram bins for a probabilistic score — the calibration
    * AUDIT companion to [[isotonicCalibrate]]'s calibration MAP (Guo et
    * al. 2017's ECE formulation over Zadrozny & Elkan's binning): per
    * equal-width score bin, exact counts, the mean predicted score, the
    * observed positive rate, their absolute gap, and the bin-share-
    * weighted expected calibration error repeated on every row (the one
    * number a data-quality gate thresholds on). The read: a quality
    * classifier whose score is to be TRUSTED as a probability (mixture
    * weighting, threshold transfer across corpora) must show small gaps;
    * a well-RANKING but miscalibrated scorer shows large ones.
    *
    * Determinism: per-row scores quantize to DECIMAL(18,8) before the
    * bin sum (exact, order-free); mean/rate/gap are fixed-shape IEEE on
    * exact aggregates; the ECE sums per-bin DECIMAL(18,8) terms over the
    * ≤ nBins-row frame. Replays engine-exact.
    *
    * Shape at 100 TB: ONE corpus aggregation with map-side partials
    * (staged — every downstream read is over the ≤ nBins-row result);
    * the share/ECE pass is a single-partition window over bins rows —
    * parameter-scale, never data-scale. */
  def calibrationBins(df: DataFrame, scoreCol: String, labelCol: String,
      nBins: Int, lo: Double = 0.0, hi: Double = 1.0,
      staging: graft.util.Staging = graft.util.Staging.LocalCheckpoint): DataFrame = {
    require(nBins >= 2 && nBins <= 10000, s"nBins must be in [2,10000], got $nBins")
    require(hi > lo, "calibrationBins needs hi > lo")
    val s = col(scoreCol).cast("double")
    val idx = least(greatest(
      floor((s - lit(lo)) * lit(nBins.toDouble) / lit(hi - lo)), lit(0.0)),
      lit((nBins - 1).toDouble)).cast("long")
    val bins = staging.stage(
      df.filter(s.isNotNull && s >= lo && s <= hi)
        .groupBy(idx.as("bin"))
        .agg(count(lit(1)).as("n"),
          sum(when(col(labelCol).cast("boolean"), 1L).otherwise(0L)).as("pos"),
          sum(s.cast("decimal(18,8)")).as("__sp")),
      "calibration-bins")
    val all = Window.partitionBy()
    bins
      .withColumn("share",
        col("n").cast("double") / sum("n").over(all).cast("double"))
      .withColumn("mean_pred", col("__sp").cast("double") / col("n").cast("double"))
      .withColumn("frac_pos", col("pos").cast("double") / col("n").cast("double"))
      .withColumn("abs_gap", abs(col("mean_pred") - col("frac_pos")))
      .withColumn("ece",
        sum((col("share") * col("abs_gap")).cast("decimal(18,8)")).over(all)
          .cast("double"))
      .select(col("bin"), col("n").cast("long").as("n"),
        col("pos").cast("long").as("pos"), round(col("share"), 6).as("share"),
        round(col("mean_pred"), 6).as("mean_pred"),
        round(col("frac_pos"), 6).as("frac_pos"),
        round(col("abs_gap"), 6).as("abs_gap"),
        round(col("ece"), 6).as("ece"))
  }

  /** Cohen's kappa (1960) between two categorical raters — chance-
    * corrected agreement, THE label-QC statistic for training-data
    * pipelines (two annotators, or an LLM judge vs a heuristic gate:
    * raw agreement flatters whenever one class dominates; kappa divides
    * the chance agreement out). Works for any shared category set, not
    * just booleans; rows where either side is null are excluded (rate
    * them or drop them upstream).
    *
    * All contingency and marginal mass is EXACT (BIGINT cells,
    * DECIMAL(38,0) marginal products — n·n overflows a long past ~3e9
    * rows); p_o, p_e and kappa are one fixed-shape IEEE chain on those
    * exact sums, so the statistic replays bit-identically. kappa is
    * NULL when p_e = 1 (a single shared category — chance explains
    * everything, the statistic is undefined).
    *
    * Shape at 100 TB: ONE (a, b)-keyed corpus aggregation with map-side
    * partials (staged — agreement, both marginals and the total all
    * read the category-scale cell frame, never the corpus). */
  def cohensKappa(df: DataFrame, aCol: String, bCol: String,
      staging: graft.util.Staging = graft.util.Staging.LocalCheckpoint): DataFrame = {
    val cells = staging.stage(
      df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
        .select(col(aCol).cast("string").as("__a"),
          col(bCol).cast("string").as("__b"))
        .groupBy("__a", "__b").agg(count(lit(1)).as("__o")),
      "kappa-cells")
    val agree = cells.filter(col("__a") === col("__b"))
      .agg(coalesce(sum("__o"), lit(0L)).as("__agree"))
    val n = cells.agg(coalesce(sum("__o"), lit(0L)).as("__n"))
    val marg = cells.groupBy("__a").agg(sum("__o").as("__ra"))
      .join(cells.groupBy("__b").agg(sum("__o").as("__cb")),
        col("__a") === col("__b"))
      .select((col("__ra").cast("decimal(38,0)") *
        col("__cb").cast("decimal(38,0)")).as("__p"))
      .agg(coalesce(sum("__p"), lit(0).cast("decimal(38,0)")).as("__s"))
    val po = col("__agree").cast("double") / col("__n").cast("double")
    val pe = col("__s").cast("double") /
      (col("__n").cast("double") * col("__n").cast("double"))
    agree.crossJoin(broadcast(n)).crossJoin(broadcast(marg))
      .select(col("__n").cast("long").as("n"),
        col("__agree").cast("long").as("agree"),
        round(po, 6).as("po"), round(pe, 6).as("pe"),
        round(when(pe === 1.0, lit(null).cast("double"))
          .otherwise((po - pe) / (lit(1.0) - pe)), 6).as("kappa"))
  }

  /** Exact Spearman rank correlation between two numeric columns:
    * Pearson over MIDRANKS, with every midrank carried as an exact
    * integer (2·midrank = 2·|{values below}| + tiecount + 1 — the
    * [[mannWhitneyU]] doubled-rank identity) and the Pearson moments as
    * DECIMAL(38,0) — so the coefficient is bit-deterministic, ties
    * handled classically, one IEEE chain at the end.
    * [[correlationMatrix]]'s monotone sibling: immune to outliers and
    * monotone warps, the screen for "related but not linearly".
    *
    * Shape: per-column value-count frames cumulate via the same
    * parallel-cumsum scheme (range partition + carry-ins), midranks
    * join back value-keyed (AQE-friendly equi-joins), then ONE moment
    * aggregate. No single-partition sort anywhere. */
  def spearman(df: DataFrame, xCol: String, yCol: String,
      staging: graft.util.Staging = graft.util.Staging.LocalCheckpoint): DataFrame = {
    val base = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).as("__x"), col(yCol).as("__y"))
    def midranks(valueCol: String, tag: String): DataFrame = {
      val counts = base.groupBy(col(valueCol).as("__v"))
        .agg(count(lit(1)).as("__c"))
      val parts = df.sparkSession.sessionState.conf.numShufflePartitions
      val ranged = staging.stage(
        counts.repartitionByRange(parts, col("__v"))
          .withColumn("__pid", spark_partition_id()), s"sp-ranged-$tag")
      val wOff = org.apache.spark.sql.expressions.Window.orderBy("__pid")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val off = ranged.groupBy("__pid").agg(sum("__c").as("__t"))
        .withColumn("__off", coalesce(sum("__t").over(wOff), lit(0L)))
        .select("__pid", "__off")
      val wIn = org.apache.spark.sql.expressions.Window
        .partitionBy("__pid").orderBy("__v")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      ranged.join(broadcast(off), Seq("__pid"))
        .select(col("__v").as(valueCol),
          (lit(2L) * (col("__off") + sum("__c").over(wIn) - col("__c")) +
            col("__c") + 1L).as(s"__r2_$tag"))
    }
    val withRanks = base
      .join(midranks("__x", "x"), Seq("__x"))
      .join(midranks("__y", "y"), Seq("__y"))
    val d38 = "decimal(38,0)"
    val rx = col("__r2_x").cast(d38)
    val ry = col("__r2_y").cast(d38)
    withRanks
      .agg(count(lit(1)).cast(d38).as("__n"),
        sum(rx).as("__sx"), sum(ry).as("__sy"),
        sum(rx * ry).cast(d38).as("__sxy"),
        sum(rx * rx).cast(d38).as("__sxx"),
        sum(ry * ry).cast(d38).as("__syy"))
      .select(col("__n").cast("long").as("n"),
        round(expr(
          "CASE WHEN (__n * __sxx - __sx * __sx) > 0 " +
            "AND (__n * __syy - __sy * __sy) > 0 THEN " +
            "CAST(__n * __sxy - __sx * __sy AS DOUBLE) / " +
            "(SQRT(CAST(__n * __sxx - __sx * __sx AS DOUBLE)) * " +
            "SQRT(CAST(__n * __syy - __sy * __sy AS DOUBLE))) END"), 6)
          .as("spearman_rho"))
  }

  /** Exact Mann–Whitney U (Wilcoxon rank-sum) between two groups:
    * doubled rank sums stay INTEGER even with midrank ties
    * (2R_A = Σ_v c_A(v)·(2·before(v) + c(v) + 1)), the tie-corrected
    * normal approximation z = (U−μ)/σ with σ²'s Σ(t³−t) term summed as
    * exact DECIMAL(38,0) (t³ overflows BIGINT past ~2.1M-row ties, the
    * burstiness Σg² discipline), and the rank-biserial effect size — the
    * nonparametric mean-shift test to [[ksTest]]'s shape test: U asks
    * "do A's values stochastically dominate B's", KS asks "do the
    * distributions differ anywhere".
    *
    * Same no-single-partition-sort machinery as [[ksTest]]: per-value
    * counts range-partition, cumulate within partitions, add broadcast
    * carry-ins. One IEEE chain per output scalar, fixed shape. */
  def mannWhitneyU(df: DataFrame, valueCol: String, groupCol: String,
      groupA: String, groupB: String,
      staging: graft.util.Staging = graft.util.Staging.LocalCheckpoint): DataFrame = {
    val base = df.filter(col(groupCol).isin(groupA, groupB) &&
      col(valueCol).isNotNull)
      .select(col(valueCol).as("__v"),
        when(col(groupCol) === groupA, 1L).otherwise(0L).as("__a"),
        when(col(groupCol) === groupB, 1L).otherwise(0L).as("__b"))
      .groupBy("__v").agg(sum("__a").as("__ca"), sum("__b").as("__cb"))
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = staging.stage(
      base.repartitionByRange(parts, col("__v"))
        .withColumn("__pid", spark_partition_id()), "mwu-ranged")
    val wOff = org.apache.spark.sql.expressions.Window.orderBy("__pid")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val off = ranged.groupBy("__pid")
      .agg(sum("__ca").as("__ta"), sum("__cb").as("__tb"))
      .withColumn("__offa", coalesce(sum("__ta").over(wOff), lit(0L)))
      .withColumn("__offb", coalesce(sum("__tb").over(wOff), lit(0L)))
      .select("__pid", "__offa", "__offb")
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy("__v")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    ranged.join(broadcast(off), Seq("__pid"))
      .select(col("__ca"), col("__cb"),
        (col("__offa") + sum("__ca").over(wIn) - col("__ca")).as("__beforeA"),
        (col("__offb") + sum("__cb").over(wIn) - col("__cb")).as("__beforeB"))
      .select(col("__ca"), col("__cb"),
        (col("__ca") * (lit(2L) * (col("__beforeA") + col("__beforeB")) +
          col("__ca") + col("__cb") + 1L)).as("__twoRaTerm"),
        {
          // c³ − c in DECIMAL: a value shared by > ~2.1M rows overflows
          // BIGINT c³ silently (non-ANSI). decimal(12,0)³ → decimal(38,0)
          // by type arithmetic (12+12+1, 25+12+1), exact to c = 1e12.
          val c = (col("__ca") + col("__cb")).cast("decimal(12,0)")
          (c * c * c - c.cast("decimal(38,0)")).as("__tieTerm")
        })
      .agg(sum("__ca").cast("long").as("__na"),
        sum("__cb").cast("long").as("__nb"),
        sum("__twoRaTerm").cast("long").as("__twoRa"),
        sum("__tieTerm").cast("decimal(38,0)").as("__ties"))
      .select(col("__na").as("n_a"), col("__nb").as("n_b"),
        expr("CAST(__twoRa - __na * (__na + 1) AS DOUBLE) / 2.0").as("u_a"),
        round(expr(
          "CASE WHEN __na > 0 AND __nb > 0 AND (__na + __nb) >= 2 AND " +
            "((CAST(__na + __nb AS DOUBLE) + 1.0) - CAST(__ties AS DOUBLE) / " +
            "(CAST(__na + __nb AS DOUBLE) * (CAST(__na + __nb AS DOUBLE) - 1.0)))" +
            " > 0.0 THEN " +
            "(CAST(__twoRa - __na * (__na + 1) AS DOUBLE) / 2.0 - " +
            "CAST(__na AS DOUBLE) * CAST(__nb AS DOUBLE) / 2.0) / " +
            "SQRT(CAST(__na AS DOUBLE) * CAST(__nb AS DOUBLE) / 12.0 * " +
            "((CAST(__na + __nb AS DOUBLE) + 1.0) - CAST(__ties AS DOUBLE) / " +
            "(CAST(__na + __nb AS DOUBLE) * (CAST(__na + __nb AS DOUBLE) - 1.0))))" +
            " END"), 6).as("z"),
        round(expr(
          "CASE WHEN __na > 0 AND __nb > 0 THEN " +
            "2.0 * (CAST(__twoRa - __na * (__na + 1) AS DOUBLE) / 2.0) / " +
            "(CAST(__na AS DOUBLE) * CAST(__nb AS DOUBLE)) - 1.0 END"), 6)
          .as("r_rank_biserial"))
  }

  /** Mutual information between two categorical columns, with marginal
    * entropies and the normalized coefficient NMI = I/√(H_a·H_b) — the
    * dependence profile behind feature selection, redundant-column
    * detection, and quasi-identifier risk scoring (a high-MI pair leaks
    * one column through the other; the information-theoretic sibling of
    * [[functionalDependencies]]' exact test).
    *
    * Determinism: counts are exact BIGINTs; each cell contributes ONE
    * fixed-shape double chain `(c_ab/n)·ln(c_ab·n/(c_a·c_b))` quantized
    * to DECIMAL(18,8) (the fluency-NLL discipline — the sum over cells
    * is then association-free), and NMI is one IEEE chain over the
    * exact sums. Null keys are excluded (documented: MI over observed
    * pairs; use [[nullRateDrift]] for presence structure).
    *
    * Shape: three aggregates off the same scan; the cell frame joins
    * BROADCAST marginals (cell cardinality |A|·|B| is the bound, the
    * marginals are its square roots); output is one row. */
  def mutualInformation(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val base = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
    val cells = base.groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__cab"))
    val ca = base.groupBy(col(aCol).as("__a")).agg(count(lit(1)).as("__ca"))
    val cb = base.groupBy(col(bCol).as("__b")).agg(count(lit(1)).as("__cb"))
    val n = base.agg(count(lit(1)).as("__n"))
    val mi = cells.join(broadcast(ca), "__a").join(broadcast(cb), "__b")
      .crossJoin(broadcast(n))
      .select(((col("__cab").cast("double") / col("__n").cast("double")) *
        log((col("__cab").cast("double") * col("__n").cast("double")) /
          (col("__ca").cast("double") * col("__cb").cast("double"))))
        .cast("decimal(18,8)").as("__t"))
      .agg(coalesce(sum("__t"), lit(0).cast("decimal(18,8)")).as("__mi"))
    def entropy(m: DataFrame, cnt: String, out: String) =
      m.crossJoin(broadcast(n))
        .select((-(col(cnt).cast("double") / col("__n").cast("double")) *
          log(col(cnt).cast("double") / col("__n").cast("double")))
          .cast("decimal(18,8)").as("__t"))
        .agg(coalesce(sum("__t"), lit(0).cast("decimal(18,8)")).as(out))
    mi.crossJoin(entropy(ca, "__ca", "__ha"))
      .crossJoin(entropy(cb, "__cb", "__hb"))
      .crossJoin(n)
      .select(col("__n").cast("long").as("n"),
        col("__mi").cast("double").as("mi"),
        col("__ha").cast("double").as("h_a"),
        col("__hb").cast("double").as("h_b"),
        when(col("__ha") > 0 && col("__hb") > 0,
          col("__mi").cast("double") /
            sqrt(col("__ha").cast("double") * col("__hb").cast("double")))
          .as("nmi"))
  }

  /** Per-column null-rate drift between two snapshots — the cheapest,
    * highest-yield data-contract check: an upstream schema change or
    * parser regression almost always shows up first as a null-rate jump
    * in one column. Complements [[psiDrift]] (value drift) with
    * presence drift.
    *
    * One single-pass aggregate per snapshot (conditional sums, map-side
    * partials, 1-row output each); the per-column unpivot runs on the
    * joined 1-row frame. Rates are one IEEE division each; `drift` is
    * their difference — deterministic under any partitioning.
    */
  def nullRateDrift(a: DataFrame, b: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "nullRateDrift needs at least one column")
    def rates(df: DataFrame, tag: String): DataFrame =
      df.agg(count(lit(1)).as(s"__n_$tag"),
        cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__c_${tag}_$c")): _*)
    val joined = rates(a, "a").crossJoin(rates(b, "b"))
    cols.map { c =>
      joined.select(lit(c).as("col_name"),
        (col(s"__c_a_$c").cast("double") / col("__n_a").cast("double")).as("null_rate_a"),
        (col(s"__c_b_$c").cast("double") / col("__n_b").cast("double")).as("null_rate_b"))
        .withColumn("drift", col("null_rate_b") - col("null_rate_a"))
    }.reduce(_ unionAll _)
  }

  /** Population-Stability-Index drift report between two snapshots of the
    * same column — the standard "did this feature's distribution move
    * between yesterday's load and today's" data-quality monitor
    * (PSI < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 investigate).
    *
    * Both snapshots bucket on the SAME fixed [lo, hi) grid (same exact
    * arithmetic as [[histogram]], out-of-range rows excluded, so the two
    * sides are always comparable across runs), counts are add-one
    * smoothed so an empty bucket on one side cannot produce ±∞, and each
    * bucket's `(p_a − p_b)·ln(p_a/p_b)` contribution is quantized ONCE to
    * DECIMAL(18,8) — the reported PSI is an exact decimal sum over
    * ≤nBuckets terms, identical under any partitioning and engine.
    *
    * Scale shape: each snapshot pays one bucket-keyed aggregate with
    * map-side partials (output ≤ nBuckets rows); everything downstream —
    * the smoothing, the log-ratios, the PSI total — runs on the
    * nBuckets-row frame with the totals broadcast. The 100 TB cost is two
    * scans, full stop.
    */
  def psiDrift(a: DataFrame, b: DataFrame, valueCol: String, nBuckets: Int,
      lo: Double, hi: Double): DataFrame = {
    require(nBuckets > 0 && hi > lo, "psiDrift needs nBuckets > 0 and hi > lo")
    def bucketCounts(df: DataFrame, out: String): DataFrame = {
      val v = col(valueCol).cast("double")
      val idx = least(
        greatest(floor((v - lit(lo)) * lit(nBuckets.toDouble) / lit(hi - lo)), lit(0.0)),
        lit((nBuckets - 1).toDouble)).cast("int")
      df.filter(v.isNotNull && v >= lo && v <= hi)
        .groupBy(idx.as("bucket")).agg(count(lit(1)).as(out))
    }
    val grid = a.sparkSession.range(nBuckets.toLong)
      .select(col("id").cast("int").as("bucket"))
    val counts = grid
      .join(bucketCounts(a, "ca"), Seq("bucket"), "left")
      .join(bucketCounts(b, "cb"), Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val tots = counts.agg(sum("ca").as("na"), sum("cb").as("nb"))
    val sm = lit(nBuckets.toLong)
    val pa = (col("ca") + 1).cast("double") / (col("na") + sm).cast("double")
    val pb = (col("cb") + 1).cast("double") / (col("nb") + sm).cast("double")
    val per = counts.crossJoin(broadcast(tots))
      .withColumn("contrib", ((pa - pb) * log(pa / pb)).cast("decimal(18,8)"))
    per.crossJoin(broadcast(per.agg(sum("contrib").as("__psi"))))
      .select(col("bucket"), col("ca").cast("long").as("cnt_a"),
        col("cb").cast("long").as("cnt_b"),
        col("contrib").cast("double").as("contrib"),
        col("__psi").cast("double").as("psi"))
  }

  /** Join-key skew diagnosis — the measurement BEHIND the salting
    * decision: for each candidate key column, the frequency concentration
    * of its values. `skew_ratio` = max key frequency over mean frequency
    * (how many times fatter the hottest shuffle partition's key is than
    * average — the direct input to choosing a salt factor R ≈ ratio);
    * `hhi` = Herfindahl index Σ(cnt/n)² (1/hhi ≈ effective number of
    * keys); `top_share` = the hot key's share of all rows. All counts are
    * exact BIGINTs (Σcnt² stays DECIMAL-exact), divisions are single IEEE
    * expressions, `top_key` ties break to the smallest key string.
    *
    * Shape at 100 TB: one groupBy per column (the same shuffle the join
    * under diagnosis would pay) feeding ONE scalar agg — run it on a
    * sample or reuse it as the join's own dry-run statistics pass. The
    * arg-max lives in the same aggregate as the stats:
    * `min(struct(-cnt, k))` orders first by -cnt (= max frequency) then
    * by k ascending, so its `k` field IS "hottest key, ties to smallest
    * string" — no second pass over the counts, no max-key re-join. */
  def keySkew(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "keySkew needs at least one column")
    cols.map { c =>
      val counts = df.groupBy(col(c).cast("string").as("k"))
        .agg(count(lit(1)).as("cnt"))
      val stats = counts.agg(
        sum("cnt").as("n"),
        count(lit(1)).as("nd"),
        max("cnt").as("mx"),
        sum(col("cnt").cast("decimal(38,0)") * col("cnt").cast("decimal(38,0)"))
          .as("sq"),
        min(struct((-col("cnt")).as("nc"), col("k").as("k"))).as("topkv"))
      stats.select(
        lit(c).as("key_col"),
        col("n").cast("long").as("n"),
        col("nd").cast("long").as("n_distinct"),
        col("topkv").getField("k").as("top_key"),
        (col("mx").cast("double") / col("n").cast("double")).as("top_share"),
        (col("sq").cast("double") /
          (col("n").cast("decimal(38,0)") * col("n").cast("decimal(38,0)"))
            .cast("double")).as("hhi"),
        (col("mx").cast("double") * col("nd").cast("double") /
          col("n").cast("double")).as("skew_ratio"))
    }.reduce(_ unionByName _)
  }

  /** Deterministic Poisson bootstrap confidence intervals for a group
    * mean (Efron 1979; the Poisson(1)-weight approximation — Chamandy
    * et al., "Estimating Uncertainty for Massive Data Streams" — that
    * makes the bootstrap a SINGLE distributed pass instead of `reps`
    * resampling shuffles): each (row, replica) draws a Poisson(1)
    * multiplicity from the inverse CDF applied to a PORTABLE integer
    * hash in 2^20 space — every comparison is integer-exact, so the
    * entire resampling plan, not just the point estimate, replays on
    * any engine or retry. Replica means use DECIMAL sums; the interval
    * is the rank-based [⌈α/2·reps⌉, reps+1−⌈α/2·reps⌉] spread of the
    * replica means.
    *
    * Shape at 100 TB: one narrow `reps`-way explode (map-side, no
    * shuffle amplification beyond the single (group, rep) aggregate —
    * ≤ groups × reps rows out), one window over the reps rows per
    * group. This is the error bar every sampled/selected metric in a
    * curation report should carry. */
  def bootstrapMeanCi(df: DataFrame, groupCols: Seq[String], valueCol: String,
      idExpr: Column, reps: Int = 32, salt: String = "boot"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(reps >= 8 && reps <= 256, s"reps $reps outside [8,256]")
    val cuts = Profiler.poissonCutoffs20
    val rep = col("__rep")
    // ONE string hash per row; per-replica draws derive via PortableHash
    // universal affine transforms mod 2^31−1 (the minhash-permutation
    // discipline) — 32 integer ops instead of 32 string hashes, and the
    // ≤0.05% modulo bias of the final 2^20 fold is far below bootstrap
    // noise
    val M31 = graft.functions.PortableHash.M31
    val aRep = pmod((rep + 1) * lit(graft.functions.PortableHash.KnuthA), lit(M31))
    val bRep = pmod((rep + 1) * lit(graft.functions.PortableHash.LcgB), lit(M31))
    val u = pmod(pmod(aRep * col("__h") + bRep, lit(M31)), lit(1L << 20))
    // when-chains evaluate the FIRST true branch, so fold from the
    // largest cutoff down to leave "u < cuts(0) -> 0" outermost
    val wOrdered = cuts.zipWithIndex.reverse
      .foldLeft(lit(cuts.length): Column) { case (acc, (c, k)) =>
        when(u < c, lit(k)).otherwise(acc) }
    // hot path stays integer end-to-end: values quantize to exact cents
    // (one decimal cast per ROW, not per replica term), weighted sums are
    // BIGINT, and the only doubles are the final per-replica divisions
    val exploded = df
      .select((groupCols.map(col)
        :+ (col(valueCol).cast("decimal(18,2)") * 100).cast("long").as("__x")
        :+ pmod(graft.functions.PolyHash56(
          concat(idExpr.cast("string"), lit(":" + salt))), lit(M31)).as("__h")): _*)
      .withColumn("__rep", explode(expr(s"sequence(0, ${reps - 1})")))
      .withColumn("__w", wOrdered.cast("long"))
    val means = exploded.groupBy((groupCols.map(col) :+ rep): _*)
      .agg(sum(col("__x") * col("__w")).as("__ws"), sum("__w").as("__n"))
      .filter(col("__n") > 0)
      .withColumn("__m", col("__ws").cast("double") / col("__n").cast("double")
        / lit(100.0))
    val gw = if (groupCols.isEmpty) Window.partitionBy(lit(1))
      else Window.partitionBy(groupCols.map(col): _*)
    val loRank = math.max(1, math.ceil(reps * 0.05).toInt)
    val hiRank = reps + 1 - loRank
    val ranked = means.withColumn("__rk",
      row_number().over(gw.orderBy(col("__m"), rep)))
    val lo = ranked.filter(col("__rk") === loRank)
      .select((groupCols.map(col) :+ round(col("__m"), 6).as("ci_lo")): _*)
    val hi = ranked.filter(col("__rk") === hiRank)
      .select((groupCols.map(col) :+ round(col("__m"), 6).as("ci_hi")): _*)
    val est = df.groupBy(groupCols.map(col): _*)
      .agg((sum(col(valueCol).cast("decimal(18,2)")).cast("double") /
        count(lit(1)).cast("double")).as("__e"),
        count(lit(1)).cast("long").as("n_rows"))
      .withColumn("mean_est", round(col("__e"), 6)).drop("__e")
    est.join(lo, groupCols).join(hi, groupCols)
  }

  /** Poisson(1) inverse-CDF cutoffs ⌊cum·2^20⌋ for k = 0..6 (mass above
    * k=7 is ~8·10⁻⁶ and rounds into the top bucket) — interpolated
    * identically into the oracle so the weights are integer-exact. */
  lazy val poissonCutoffs20: Seq[Long] = {
    var p = math.exp(-1.0)
    var c = 0.0
    (0 to 6).map { k =>
      c += p
      p = p / (k + 1)
      (c * (1L << 20)).toLong
    }
  }

  /** Frequency-ordered dictionary encoding: dense integer ids for a
    * categorical key, id 0 = most frequent (the id order that makes
    * downstream varint/dictionary compression and "top-N classes" cuts
    * cheap — the standard vocab-building step). Deterministic total
    * order (count DESC, key ASC), so the vocabulary is a pure function
    * of the data under any partitioning.
    *
    * The dense ids also unlock [[graft.x.Sketches.bitmapWords]]'
    * EXACT-bitmap family for string keys — encode once, bitmap forever
    * (the "dense-rank dictionary" that doc points at).
    *
    * Scale shape: NOT a global `row_number()` window (that is a single
    * partition holding the whole vocabulary) — the id is assigned
    * range-partitioned with per-range offsets, the
    * [[graft.x.Sampling.tokenBudgetSelect]] pattern: the only
    * SinglePartition work is one row per shuffle partition. */
  def dictionaryEncode(df: DataFrame, keyCol: String, minCount: Long = 1L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
    val sortCols = Seq(col("cnt").desc, col(keyCol))
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = counts.repartitionByRange(parts, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    val wOff = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = ranged.groupBy("__pid").agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum("__n").over(wOff), lit(0L)))
      .select("__pid", "__off")
    val wIn = Window.partitionBy("__pid").orderBy(sortCols: _*)
    ranged.join(broadcast(off), Seq("__pid"))
      .select(col(keyCol),
        (col("__off") + row_number().over(wIn) - 1).cast("long").as("id"),
        col("cnt").cast("long").as("cnt"))
  }

  /** Benford's-law audit (Benford 1938; Nigrini's fraud-detection use):
    * first-significant-digit distribution of a positive numeric column
    * vs the expected share log10(1+1/d). Organic multiplicative data
    * (prices, populations, transaction amounts) follows it; fabricated
    * or truncated data doesn't — the classic data-forensics screen, and
    * at pipeline scale a cheap per-batch drift alarm (the digit
    * histogram is 9 rows; per-segment histograms merge by count-sum).
    *
    * The first digit is taken from the BIGINT's decimal string — integer
    * formatting, not float log10, so the digit assignment is exact on
    * any engine. One digit-keyed aggregate with map-side partials; the
    * chi-square term per digit is (obs − n·e)²/(n·e) for badness
    * ranking (Σ over 8 d.o.f. for the formal test). */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val v = floor(col(valueCol)).cast("long")
    val digits = df.select(v.as("__v")).filter(col("__v") >= 1)
      .select(substring(col("__v").cast("string"), 1, 1).cast("int").as("digit"))
    val counts = digits.groupBy("digit").agg(count(lit(1)).as("cnt"))
    val n = counts.agg(sum("cnt").as("__n"))
    counts.crossJoin(broadcast(n))
      .withColumn("benford_share",
        log(lit(1.0) + lit(1.0) / col("digit").cast("double")) / log(lit(10.0)))
      .withColumn("obs_share",
        col("cnt").cast("double") / col("__n").cast("double"))
      .withColumn("chi2_term", {
        val e = col("__n").cast("double") * col("benford_share")
        (col("cnt").cast("double") - e) * (col("cnt").cast("double") - e) / e
      })
      .select(col("digit"), col("cnt").cast("long").as("cnt"),
        round(col("obs_share"), 6).as("obs_share"),
        round(col("benford_share"), 6).as("benford_share"),
        round(col("chi2_term"), 6).as("chi2_term"))
  }
}
