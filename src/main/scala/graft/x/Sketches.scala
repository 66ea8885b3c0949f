package graft.x

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Register-based cardinality and frequency sketches (HyperLogLog,
  * count-min) over md5 — a hash BOTH engines ship natively with identical
  * hex output, so every register index, rank and counter — and therefore
  * the ESTIMATES — replay exactly on the DuckDB oracle in SQL. md5 and
  * not [[graft.functions.PolyHash56]]+spread: rank statistics (leading-
  * zero counts, max-per-register) need avalanche quality; an affine LCG
  * spread of polynomial hashes leaves near-consecutive keys on a lattice
  * whose low-bit structure biases max-rho by whole units (measured: 2×
  * cardinality underestimate on a keyN corpus), while md5's bits are
  * independent of input structure. KMV ([[graft.functions.KmvSketchAgg]])
  * keeps the cheap poly hash because bottom-k ORDER statistics only need
  * distinctness + equidistribution, not per-bit independence.
  *
  * Complements the KMV theta sketch ([[KmvSketchAgg]]): KMV buys set
  * algebra (union/Jaccard from sketch columns), HLL buys fixed O(m)
  * memory per group independent of k-th-order statistics, and count-min
  * answers point frequency queries Misra-Gries
  * ([[graft.functions.FrequentItemsAgg]]) cannot — MG keeps only the
  * top-k survivors, CMS estimates ANY key after one pass.
  *
  * At 100 TB: both sketches reduce per map task (a groupBy over
  * register/counter indexes with map-side partial max/sum), so the
  * shuffle carries ≤ m (HLL) or depth×width (CMS) rows per group per
  * task instead of one row per distinct value — the reason these are the
  * standard telemetry/profiling sketches at cluster scale. Sketch rows
  * are data: persist them per batch/segment and re-aggregate (max/sum
  * re-associates losslessly) to merge across days without re-scanning.
  *
  * Reference anchor: profiling/validation counts are the reference's
  * Tier-A surface (/root/reference/spark.json:40-52); these are their
  * at-scale approximate siblings.
  */
object Sketches {

  /** Register/counter address bits come in whole hex chars (the md5
    * output unit), and rho is capped at 48 so 2^(56-rho) stays exact in
    * BIGINT before the DECIMAL register sum. */
  private def checkB(b: Int): Unit =
    require(b >= 4 && b <= 16 && b % 4 == 0,
      s"register bits b=$b must be a multiple of 4 in [4,16]")

  /** Max rho: deeper leading-zero runs are astronomically rare
    * (P ≈ 2^-48 per value) and capping keeps every 2^(56-rho) in BIGINT. */
  val MaxRho = 48

  /** md5 hex of a value's string form — identical on Spark and DuckDB
    * (`MD5(CAST(x AS VARCHAR))`), the shared base of register and rank. */
  def md5Hex(value: Column): Column = md5(value.cast("string"))

  /** Per-value HLL register index: the first b/4 hex chars of the md5,
    * as an integer (conv base 16; the oracle unrolls STRPOS nibbles). */
  def hllRegister(hex: Column, b: Int): Column = {
    checkB(b)
    conv(substring(hex, 1, b / 4), 16, 10).cast("long")
  }

  /** Per-value HLL rank rho = leading zero BITS of the hex tail after
    * the register chars + 1, from string arithmetic only (no floating
    * log, no engine-specific bit intrinsics): strip leading '0' hex
    * chars, then count the leading zero bits inside the first surviving
    * nibble via a 4-way CASE. An all-zero tail gets [[MaxRho]]. */
  def hllRho(hex: Column, b: Int): Column = {
    checkB(b)
    val tailLen = 32 - b / 4
    val t = regexp_replace(substring(hex, b / 4 + 1, tailLen), "^0*", "")
    val dv = conv(substring(t, 1, 1), 16, 10).cast("int")
    val nzBits = when(dv >= 8, lit(0)).when(dv >= 4, lit(1))
      .when(dv >= 2, lit(2)).otherwise(lit(3))
    when(t === "", lit(MaxRho))
      .otherwise(least(lit(4) * (lit(tailLen) - length(t)) + nzBits + lit(1),
        lit(MaxRho)))
  }

  /** The standard HLL bias constant alpha_m, built from double literals
    * with the same IEEE expression the SQL oracle uses. */
  def hllAlpha(m: Int): Double = 0.7213 / (1.0 + 1.079 / m.toDouble)

  /** Grouped HyperLogLog distinct estimate (Flajolet et al. 2007) of
    * `valueCol` with 2^b registers. Returns one row per group:
    * `est` (raw HLL estimate — no small-range correction, see below),
    * `v_zero` (empty registers, the linear-counting input a consumer
    * needs to decide whether to trust `est`), and the register sum
    * `z56` (DECIMAL-exact Σ 2^(56-M_j), the mergeable denominator).
    *
    * Determinism: register index, rho, max-rank and the power-of-two
    * denominator are all integer; the estimate is one double multiply
    * chain + divide of identical operands, so it replays bit-for-bit on
    * the oracle. The ln-based small-range correction is intentionally
    * NOT applied — `ln` is not correctly-rounded-portable across libm
    * implementations; callers with v_zero > 0 and a small estimate
    * should prefer the exact count (they are in exact-count range). */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
      b: Int = 8): DataFrame =
    hllEstimateFromRegisters(hllRegisters(df, groupCols, valueCol, b), groupCols, b)

  /** The register rows themselves: one (group, register j, max-rank mj)
    * row per occupied register — the PERSISTABLE form of the sketch.
    * Store these per day/batch/segment; sketches over any union of
    * segments come from re-aggregating `max(mj)` by (group, j) — max
    * re-associates losslessly, so merging never rescans the data
    * ([[hllEstimateFromRegisters]] accepts the re-aggregated rows
    * directly). ≤ 2^b rows per group regardless of input size. */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], valueCol: String,
      b: Int = 8): DataFrame = {
    checkB(b)
    val g = groupCols.map(col)
    val h = md5Hex(col(valueCol))
    df.select(g :+ hllRegister(h, b).as("__j") :+ hllRho(h, b).as("__rho"): _*)
      .groupBy(g :+ col("__j"): _*)
      .agg(max(col("__rho")).as("__mj"))
  }

  /** Estimate from [[hllRegisters]] rows (possibly merged across
    * segments by max-re-aggregation on (group, __j)). */
  def hllEstimateFromRegisters(regs: DataFrame, groupCols: Seq[String],
      b: Int = 8): DataFrame = {
    checkB(b)
    val m = 1 << b
    val g = groupCols.map(col)
    regs
      .groupBy(g: _*)
      .agg(
        count(lit(1)).as("__present"),
        // 2^(56-Mj) exactly, as BIGINT then DECIMAL (the register sum can
        // exceed BIGINT at 56-bit scale); shiftleft-by-column needs the
        // SQL form — the Scala helper only takes literal bit counts
        sum(expr("CAST(shiftleft(CAST(1 AS BIGINT), 56 - __mj) AS DECIMAL(38,0))"))
          .as("__zp"))
      .select(g ++ Seq(
        (lit(hllAlpha(m) * (m.toLong * m.toLong).toDouble) *
          lit((1L << 56).toDouble) /
          (col("__zp") + (lit(m.toLong) - col("__present"))
            .cast("decimal(38,0)") * lit(java.math.BigDecimal.valueOf(1L << 56)))
            .cast("double")).as("est"),
        (lit(m.toLong) - col("__present")).cast("long").as("v_zero"),
        (col("__zp") + (lit(m.toLong) - col("__present")).cast("decimal(38,0)") *
          lit(java.math.BigDecimal.valueOf(1L << 56))).cast("decimal(38,0)")
          .as("z56")): _*)
  }

  /** Count-min counter index for hash row `i`: the first widthBits/4
    * hex chars of `md5("<i>|<key>")` — `depth` independent hash rows
    * from one family by key prefixing. */
  def cmsIndex(keyCol: Column, i: Int, widthBits: Int): Column = {
    checkB(widthBits)
    conv(substring(
      md5Hex(concat(lit(i.toString), lit("|"), keyCol.cast("string"))),
      1, widthBits / 4), 16, 10).cast("long")
  }

  /** Count-min sketch (Cormode & Muthukrishnan 2005) of `keyCol`
    * occurrence counts: `depth` × 2^widthBits counters, returned as one
    * row per (i, c) with the summed count. Mergeable: counter matrices
    * from different batches add cell-wise (re-aggregate by (i, c)). */
  def cmsBuild(df: DataFrame, keyCol: String, depth: Int = 4,
      widthBits: Int = 8): DataFrame = {
    require(depth >= 1 && depth <= 8, s"cms depth $depth outside [1,8]")
    checkB(widthBits)
    df.select(
        explode(array((0 until depth).map { i =>
          struct(lit(i).as("i"), cmsIndex(col(keyCol), i, widthBits).as("c"))
        }: _*)).as("__ic"))
      .groupBy(col("__ic.i").as("i"), col("__ic.c").as("c"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates from a [[cmsBuild]] sketch for each
    * distinct key in `probes(keyCol)`: est = min over hash rows of the
    * addressed counter — the classic CMS upper bound (est ≥ true count,
    * overshoot bounded by collisions). Integer-exact end to end.
    *
    * The addressed cells LEFT-join the sketch with empty cells counting
    * as 0: [[cmsBuild]] materializes only touched counters, so an
    * unseen probe key addressing an untouched cell must see 0 there —
    * the inner-join alternative would both loosen the min (skipping the
    * zero cells) and silently DROP keys whose cells are all empty,
    * instead of answering est = 0. */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, keyCol: String,
      depth: Int = 4, widthBits: Int = 8): DataFrame = {
    require(depth >= 1 && depth <= 8, s"cms depth $depth outside [1,8]")
    checkB(widthBits)
    val addressed = probes.select(col(keyCol)).distinct()
      .select(col(keyCol),
        explode(array((0 until depth).map { i =>
          struct(lit(i).as("i"), cmsIndex(col(keyCol), i, widthBits).as("c"))
        }: _*)).as("__ic"))
      .select(col(keyCol), col("__ic.i").as("i"), col("__ic.c").as("c"))
    addressed
      .join(sketch, Seq("i", "c"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Equi-join-size estimation from two [[cmsBuild]] sketches over the
    * SAME (depth, widthBits) geometry — the count-min inner-product
    * estimate (Cormode & Muthukrishnan 2005, §4.2):
    *
    *   |A ⋈_key B| ≤ est = min_i Σ_c A[i][c]·B[i][c]
    *
    * an upper bound whose overshoot is collision cross-talk (per row
    * E[overshoot] ≤ ‖A‖₁·‖B‖₁ / 2^widthBits; the min over depth rows
    * tightens it). This is the answer a planner needs BEFORE committing
    * to a join strategy at 100 TB: whether |A ⋈ B| explodes (pre-salt /
    * pre-aggregate first) or stays benign is read off two sketch scans,
    * never by running the join. With `b eq a` it estimates self-join
    * size Σ_k c_k² — the degree-squared sum that predicts self-join
    * blow-up, the same quantity [[graft.x.Profiler.keySkew]] diagnoses
    * exactly but from a mergeable summary that can be kept per
    * batch/partition and added cell-wise.
    *
    * Integer-exact: BIGINT sums of BIGINT products (safe while per-cell
    * counts stay under ~2^31), the same md5 indexing the x146 oracle
    * replays. Cells present on one side only multiply to zero (inner
    * join); a depth row with NO overlapping cells contributes inner
    * product 0 (left join from the literal depth range), so disjoint
    * key sets answer est = 0 rather than dropping the row from the
    * min. */
  def cmsJoinSizeEstimate(a: DataFrame, b: DataFrame, depth: Int = 4,
      widthBits: Int = 8): DataFrame = {
    require(depth >= 1 && depth <= 8, s"cms depth $depth outside [1,8]")
    checkB(widthBits)
    val prods = a.select(col("i"), col("c"), col("cnt").as("__ca"))
      .join(b.select(col("i"), col("c"), col("cnt").as("__cb")), Seq("i", "c"))
      .groupBy("i").agg(sum(col("__ca") * col("__cb")).as("__ip"))
    a.sparkSession.range(depth).select(col("id").cast("int").as("i"))
      .join(prods, Seq("i"), "left")
      .agg(min(coalesce(col("__ip"), lit(0L))).cast("long").as("est_join_size"))
  }

  // ------------------------------------------------------------- bitmaps

  /** Word-aligned integer bitmaps: EXACT distinct/intersection over
    * non-negative integer ids at sketch-like shuffle cost — the
    * roaring-bitmap idea (Chambi et al. 2016; ClickHouse `groupBitmap`,
    * Druid/Pinot bitmap indexes) reduced to its relational essence. A
    * group's id set becomes one row per occupied 64-id word:
    *
    *   (group, w = id div 64, bits = BIT_OR(1 << (id mod 64)))
    *
    * `bit_or` is commutative/associative/idempotent, so the aggregate
    * partial-combines map-side (duplicate ids collapse BEFORE the
    * shuffle) and word rows are DATA: persist them per day/segment and
    * re-`bit_or` by (group, w) to merge stores without rescanning —
    * exactly [[hllRegisters]]' persist-and-merge pattern but lossless.
    * distinct = Σ bit_count(bits); |A ∩ B| = Σ bit_count(a & b) from a
    * word-keyed equi-join that never materializes the id lists.
    *
    * At 100 TB this is the retention/audience-overlap workhorse: daily
    * active-user bitmaps shuffle ≤ |id-universe|/64 rows per group per
    * map task (dense ids: 64 users per row, 8 bytes), day-over-day
    * returning-user counts are word-joins of two day stores, and unlike
    * HLL/KMV the answers are exact — the right tool whenever ids are
    * integers (surrogate keys, dictionary-encoded users). Non-integer
    * ids take the HLL/KMV path instead; a dense-rank dictionary would
    * make bitmap exactness available but adds its own shuffle. */
  def bitmapWords(df: DataFrame, groupCols: Seq[String], idCol: String): DataFrame = {
    val id = col(idCol).cast("long")
    df.filter(id >= 0)
      .groupBy((groupCols.map(col) :+
        expr(s"CAST($idCol AS BIGINT) div 64").as("__w")): _*)
      .agg(expr(s"bit_or(shiftleft(CAST(1 AS BIGINT), " +
        s"CAST(pmod(CAST($idCol AS BIGINT), 64) AS INT)))").as("__bits"))
  }

  /** Merge word rows from several [[bitmapWords]] stores (same geometry):
    * `bit_or` by (group, word) — lossless, any grouping of batches. */
  def bitmapMerge(words: DataFrame, groupCols: Seq[String]): DataFrame =
    words.groupBy((groupCols.map(col) :+ col("__w")): _*)
      .agg(expr("bit_or(__bits)").as("__bits"))

  /** Exact per-group distinct count from [[bitmapWords]] rows, plus the
    * occupied-word count (the store's size — the compactness audit). */
  def bitmapDistinct(words: DataFrame, groupCols: Seq[String]): DataFrame =
    words.groupBy(groupCols.map(col): _*)
      .agg(sum(bit_count(col("__bits"))).cast("long").as("distinct_cnt"),
        count(lit(1)).cast("long").as("n_words"))

  /** Exact |A ∩ B| per group pair: word-keyed inner join + popcount of
    * the AND. Words present on one side only intersect to zero and the
    * inner join drops them — correct, and the join carries only occupied
    * words. `aCols`/`bCols` name the group columns to keep from each
    * side (renamed before the join to avoid collisions). */
  def bitmapIntersect(a: DataFrame, b: DataFrame, groupColsA: Seq[String],
      groupColsB: Seq[String]): DataFrame = {
    val ar = groupColsA.foldLeft(a)((d, c) => d.withColumnRenamed(c, s"a_$c"))
      .withColumnRenamed("__bits", "__ba")
    val br = groupColsB.foldLeft(b)((d, c) => d.withColumnRenamed(c, s"b_$c"))
      .withColumnRenamed("__bits", "__bb")
    ar.join(br, Seq("__w"))
      .groupBy((groupColsA.map(c => col(s"a_$c")) ++
        groupColsB.map(c => col(s"b_$c"))): _*)
      .agg(sum(bit_count(col("__ba").bitwiseAND(col("__bb"))))
        .cast("long").as("overlap_cnt"))
  }

  // ------------------------------------------------------- HDR histogram

  /** HDR-histogram bucketing (Tene's HdrHistogram design): non-negative
    * integer values bucket by base-2 exponent with 2^p linear sub-buckets
    * per octave, so every bucket's width is ≤ 2^-p of its value —
    * bounded RELATIVE error at every magnitude, from nanoseconds to
    * hours, with ~64·2^p buckets total. Unlike log-base-γ sketches
    * (DDSketch) the index needs NO floating log: the exponent is the
    * value's bit length (`length(bin(v)) - 1`), integer-exact on any
    * engine — which is what makes the whole sketch, and its quantile
    * answers, hash-replayable on the oracle.
    *
    *   v < 2^(p+1):  id = v                      (exact region)
    *   else:         id = (e−p)·2^p + (v >> (e−p)),  e = bitlen(v)−1
    *
    * ids are contiguous and monotone in v, so quantiles come from a
    * cumulative count over id order. Bucket rows are DATA, exactly like
    * [[hllRegisters]]/[[bitmapWords]]: counts partial-aggregate map-side,
    * per-day/segment histograms merge by (group, id) count-sum without
    * rescanning, and a 100 TB p99 is answered from ≤ ~2k rows per group
    * — no global sort of the raw values, which is what
    * `percentile`/`approx_percentile` would shuffle toward a single
    * reduce per group. */
  def hdrHistogram(df: DataFrame, groupCols: Seq[String], valueCol: String,
      p: Int = 5): DataFrame = {
    require(p >= 1 && p <= 16, s"sub-bucket bits p=$p outside [1,16]")
    val twoP = 1L << p
    df.select((groupCols.map(col) :+ col(valueCol).cast("long").as("__v")): _*)
      .filter(col("__v") >= 0)
      .withColumn("__b", expr(
        s"""CASE WHEN __v < ${2 * twoP} THEN __v
            ELSE CAST(length(bin(__v)) - 1 - $p AS BIGINT) * $twoP
                 + shiftright(__v, length(bin(__v)) - 1 - $p) END"""))
      .groupBy((groupCols.map(col) :+ col("__b")): _*)
      .agg(count(lit(1)).as("__cnt"))
  }

  /** Merge [[hdrHistogram]] rows across stores (same p): count-sum. */
  def hdrMerge(hist: DataFrame, groupCols: Seq[String]): DataFrame =
    hist.groupBy((groupCols.map(col) :+ col("__b")): _*)
      .agg(sum("__cnt").as("__cnt"))

  /** Inclusive lower bound of bucket `__b` — the sketch's quantile
    * answer; the true value lies in [lb, lb·(1+2^-p)). */
  def hdrLowerBoundSql(p: Int): String = {
    val twoP = 1L << p
    s"""CASE WHEN __b < ${2 * twoP} THEN __b
        ELSE shiftleft((__b % $twoP) + $twoP, CAST(__b div $twoP AS INT) - 1) END"""
  }

  /** Per-row CDF lookup against [[hdrHistogram]] rows — the inverse
    * direction of [[hdrQuantiles]]: each probe row gets the fraction of
    * the sketched distribution at or below its bucket (within 2^-p
    * relative value error). This is how a persisted histogram store
    * answers "what percentile is THIS latency/price" for a stream of
    * rows without touching the raw history: the probe side joins
    * (group, bucket) against ≤ ~64·2^p cumulative rows per group —
    * broadcast-sized by construction.
    *
    * Probes whose bucket never occurred in the sketched data drop (inner
    * join); build the histogram over a superset of the probe values (the
    * natural same-table or history-covers-today usage). */
  def hdrCdf(hist: DataFrame, probes: DataFrame, groupCols: Seq[String],
      valueCol: String, p: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gw = if (groupCols.isEmpty) Window.partitionBy(lit(1))
      else Window.partitionBy(groupCols.map(col): _*)
    val cum = hist
      .withColumn("__cum", sum("__cnt").over(gw.orderBy("__b")))
      .withColumn("__n", sum("__cnt").over(gw))
      .select((groupCols.map(col) ++ Seq(col("__b"), col("__cum"), col("__n"))): _*)
    val twoP = 1L << p
    val pb = probes
      .select((groupCols.map(col) :+ col(valueCol).cast("long").as("__v")): _*)
      .filter(col("__v") >= 0)
      .withColumn("__b", expr(
        s"""CASE WHEN __v < ${2 * twoP} THEN __v
            ELSE CAST(length(bin(__v)) - 1 - $p AS BIGINT) * $twoP
                 + shiftright(__v, length(bin(__v)) - 1 - $p) END"""))
    pb.join(broadcast(cum), groupCols :+ "__b")
      .select((groupCols.map(col) ++ Seq(col("__v"),
        (col("__cum").cast("double") / col("__n").cast("double")).as("cdf"))): _*)
  }

  /** Discrete quantiles from [[hdrHistogram]] rows: per group, the first
    * bucket whose cumulative count reaches ⌈q·n⌉, answered as the bucket
    * lower bound. `qs` are decimal-literal strings ("0.5", "0.99") so
    * ⌈q·n⌉ is DECIMAL-exact — no float product in the rank arithmetic.
    * One cumulative window per group over ≤ ~64·2^p bucket rows (tiny by
    * construction — this is post-sketch math, not data-scale work). */
  def hdrQuantiles(hist: DataFrame, groupCols: Seq[String],
      qs: Seq[String], p: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gw = if (groupCols.isEmpty) Window.partitionBy(lit(1))
      else Window.partitionBy(groupCols.map(col): _*)
    val cum = hist
      .withColumn("__cum", sum("__cnt").over(gw.orderBy("__b")))
      .withColumn("__n", sum("__cnt").over(gw))
    val qFrame = qs.map(q => s"SELECT CAST($q AS STRING) AS q").mkString(" UNION ALL ")
    val qDf = hist.sparkSession.sql(qFrame)
    cum.crossJoin(broadcast(qDf))
      .filter(col("__cum") >= expr("CEIL(CAST(q AS DECIMAL(10,6)) * __n)"))
      .groupBy((groupCols.map(col) :+ col("q")): _*)
      .agg(min("__b").as("__b"), max("__n").cast("long").as("n"))
      .withColumn("q_value", expr(hdrLowerBoundSql(p)))
      .drop("__b")
  }
}
