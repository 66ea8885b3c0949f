package graft.x

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PolyHash56

/** Deterministic sampling / splitting for training-data pipelines.
  *
  * Everything keys off a PORTABLE hash of the row id (+ a salt naming the
  * decision), never an RNG: the same row always lands in the same sample /
  * split / bucket regardless of partitioning, executor count, retries, or
  * engine — the property a reproducible 100 TB data pipeline actually
  * needs (Spark's `sample()` is seed-stable only for a fixed partitioning,
  * which no production table keeps). Zero shuffles: every operator here is
  * a narrow filter/projection; only the optional count summaries aggregate.
  */
object Sampling {

  private val Buckets = 1000000L

  /** Uniform hash-bucket of `id` in [0, 1000000): the shared primitive.
    * Salted so independent decisions (sample vs split) decorrelate. */
  def hashBucket(id: Column, salt: String): Column =
    pmod(PolyHash56(concat(id.cast("string"), lit(":" + salt))), lit(Buckets))

  /** Deterministic uniform sample: keep ~`fraction` of rows. */
  def sample(df: DataFrame, idCol: String, fraction: Double, salt: String = "sample"): DataFrame =
    df.filter(hashBucket(col(idCol), salt) < (fraction * Buckets).toLong)

  /** Deterministic stratified sample: per-stratum keep fractions (absent
    * strata keep everything). The classic data-mix rebalancing step —
    * downweight overrepresented languages/sources without a shuffle. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      fractions: Map[String, Double], salt: String = "sample"): DataFrame = {
    val threshold = fractions.foldLeft(lit(Buckets): Column) { case (acc, (k, f)) =>
      when(col(strataCol) === k, lit((f * Buckets).toLong)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol), salt) < threshold)
  }

  /** Deterministic train/validation/test assignment: adds `split` without
    * moving a single row. Fractions are cumulative bucket ranges, so the
    * splits are disjoint and exhaustive by construction. */
  def trainTestSplit(df: DataFrame, idCol: String, testFraction: Double,
      validationFraction: Double = 0.0, salt: String = "split"): DataFrame = {
    val b = hashBucket(col(idCol), salt)
    val testLim = (testFraction * Buckets).toLong
    val valLim = testLim + (validationFraction * Buckets).toLong
    df.withColumn("split",
      when(b < testLim, "test")
        .when(b < valLim, "validation")
        .otherwise("train"))
  }

  /** Leakage-safe train/validation/test assignment: every member of a
    * near-duplicate cluster lands in the SAME split. A plain per-document
    * split ([[trainTestSplit]]) puts two near-copies of one page on
    * opposite sides of the train/test boundary — the evaluation then
    * scores memorization, not generalization (the published dedup
    * literature's motivating failure). Here the hash-bucket decision is
    * made on a per-document SPLIT KEY: the document's connected-component
    * representative from near-dup clustering
    * ([[graft.x.Dedup.connectedComponents]]'s `(id, comp)` output), or the
    * document's own id when it belongs to no cluster. Same cluster → same
    * key → same bucket → same split, with the same disjoint-and-exhaustive
    * cumulative ranges as the per-document operator.
    *
    * Shape at 100 TB: the clusters frame only contains documents that
    * matched a near-dup pair (a small fraction of the corpus), so the left
    * join is broadcast-able in the common case and at worst shuffles on
    * the id the corpus is already keyed by; the split itself stays a
    * narrow projection. The `split_key` column is kept in the output as
    * the audit surface (group by it to verify no key straddles splits). */
  def leakageSafeSplit(df: DataFrame, idCol: String, clusters: DataFrame,
      testFraction: Double, validationFraction: Double = 0.0,
      salt: String = "split"): DataFrame = {
    val reps = clusters.select(col("id").as(idCol), col("comp").as("__rep"))
    val b = hashBucket(col("split_key"), salt)
    val testLim = (testFraction * Buckets).toLong
    val valLim = testLim + (validationFraction * Buckets).toLong
    df.join(reps, Seq(idCol), "left")
      .withColumn("split_key", coalesce(col("__rep"), col(idCol)))
      .drop("__rep")
      .withColumn("split",
        when(b < testLim, "test")
          .when(b < valLim, "validation")
          .otherwise("train"))
  }

  /** Deterministic epoch shuffle, sharded: assigns every row a
    * (shard, pos) — a reproducible random permutation expressed the way
    * training pipelines consume one (shard = output file, pos = order
    * within it), so adjacent source documents (same crawl, same domain)
    * scatter across batches. Both coordinates are pure functions of
    * (id, salt): shard = salted hash mod nShards, pos = rank of a second
    * salted hash within the shard (id breaks ties). Stable under
    * partitioning, retries, and engine; re-salting gives the next epoch's
    * permutation. One hash-shuffle + per-shard sort — the windows are
    * PARTITIONED by shard, so there is no single-partition global sort
    * anywhere (a global row_number would serialize the corpus through one
    * task at 100 TB). */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int,
      salt: String = "epoch0"): DataFrame = {
    val shard = pmod(PolyHash56(concat(col(idCol).cast("string"), lit(":" + salt + ":shard"))),
      lit(nShards.toLong))
    val order = PolyHash56(concat(col(idCol).cast("string"), lit(":" + salt + ":pos")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(order.asc, col(idCol).asc)
    df.withColumn("shard", shard)
      .withColumn("pos", row_number().over(w).cast("long") - 1)
  }

  /** Length-grouped batch assignment for padding-efficient training:
    * rank the corpus longest-first and cut consecutive `batchSize`-row
    * batches, so each batch holds near-equal lengths and the padded
    * token waste `batch·max(len) − Σlen` collapses versus random
    * batching (the public dynamic-batching / bucketed-batching trick
    * behind every LLM data loader). Emits (idCol, lenCol, batch_id);
    * aggregate per batch for the waste report.
    *
    * The rank is [[graft.x.Dedup.globalRowNumber]] — range partition +
    * parallel per-range rank + broadcast offsets — so the global
    * longest-first order costs one range exchange, never a
    * single-partition window. All integers; deterministic under ties via
    * the id tiebreak. */
  def lengthBatches(df: DataFrame, lenCol: String, idCol: String,
      batchSize: Int): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    Dedup.globalRowNumber(
      df.select(col(idCol), col(lenCol).cast("long").as(lenCol)),
      Seq(col(lenCol).desc, col(idCol)))
      // `div`: integer division (a bare `/` on longs is a double divide)
      .withColumn("batch_id", expr(s"(rank - 1) div $batchSize"))
      .drop("rank")
  }

  /** Token-budget selection — assemble a training set of AT MOST `budget`
    * tokens by taking documents best-first: rows are ordered by
    * (`priorityCol` DESC, `idCol` ASC) and kept while the inclusive
    * running token total stays within the budget (the document that would
    * cross the line is excluded, not truncated). This is the "give me N
    * billion tokens of the best data" primitive every training-mix
    * assembly ends with, made a pure function of (priority, id, budget) —
    * no RNG, no partition dependence, replayable by any engine.
    *
    * The running total is the [[graft.x.Dedup.globalRowNumber]]
    * discipline applied to a SUM: `SUM(tokens) OVER (ORDER BY …)` would
    * funnel the corpus through ONE task, so instead the frame
    * range-partitions on the sort key, each range cumsums in parallel
    * under a per-range window, and the cross-range carry is a
    * driver-scale offsets frame (one row per partition) broadcast back.
    * Ranges whose carry-in already exceeds the budget are dropped BEFORE
    * their window runs — the selection never windows more than one range
    * past the cut, so a 1%-of-corpus budget pays the range exchange plus
    * a window over roughly the selected slice only.
    *
    * Contract: `idCol` unique (the deterministic tiebreak), token counts
    * ≥ 0 (negative counts would break the prefix monotonicity the
    * partition pruning relies on). Emits the kept rows with their
    * inclusive global `cum_tokens` as the audit column. */
  def tokenBudgetSelect(df: DataFrame, idCol: String, tokenCol: String,
      priorityCol: String, budget: Long,
      staging: graft.util.Staging = graft.util.Staging.LocalCheckpoint): DataFrame = {
    require(budget >= 0L, s"budget must be >= 0, got $budget")
    val sortCols = Seq(col(priorityCol).desc, col(idCol))
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = staging.stage(
      df.select(col(idCol), col(tokenCol).cast("long").as(tokenCol), col(priorityCol))
        .repartitionByRange(parts, sortCols: _*)
        .withColumn("__pid", spark_partition_id()),
      "token-budget-ranged")
    // per-range token totals → exclusive carry-in per range: driver-scale
    // (one row per partition), windowed over `parts` rows, broadcast back
    val wOff = org.apache.spark.sql.expressions.Window.orderBy("__pid")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val off = ranged.groupBy("__pid").agg(sum(col(tokenCol)).as("__t"))
      .withColumn("__off", coalesce(sum("__t").over(wOff), lit(0L)))
      .select("__pid", "__off")
    // ranges already past the budget never window a row
    val eligible = ranged.join(broadcast(off), Seq("__pid"))
      .filter(col("__off") <= budget)
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy(sortCols: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    eligible
      .withColumn("cum_tokens", col("__off") + sum(col(tokenCol)).over(wIn))
      .filter(col("cum_tokens") <= budget)
      .drop("__pid", "__off")
  }

  /** Fractional-EPOCH mixture: materialize each stratum `epochs(k)` times,
    * where the factor need not be an integer — the public data-recipe
    * shape (quality domains repeat 2-4 epochs, bulk crawl under 1) that
    * [[mixtureRebalance]]'s downsample-only contract can't express. Every
    * row of stratum k appears `floor(e_k)` times, plus once more for the
    * deterministic `frac(e_k)` hash-share of ids — so the stratum's
    * expected multiplicity is exactly e_k, the SAME ids are the
    * upsampled ones on every run/engine, and factors < 1 degrade to plain
    * deterministic downsampling. Strata absent from `epochs` drop
    * (factor 0), matching [[mixtureRebalance]].
    *
    * Emits the input row with a 0-based `epoch` column — downstream can
    * shuffle-shard each epoch copy independently ([[shuffleShards]] keyed
    * by (id, epoch)) or skip materialization entirely and let the loader
    * replay row ids per epoch. Shape at 100 TB: one narrow
    * filter+explode pass, NO shuffle — the write amplification is the
    * semantics, not the plan (floor+1 copies max per row). */
  def epochMixture(df: DataFrame, idCol: String, strataCol: String,
      epochs: Map[String, Double], salt: String = "epochs"): DataFrame = {
    require(epochs.nonEmpty && epochs.values.forall(e => e >= 0.0 && e <= 100.0),
      "epoch factors must be in [0, 100]")
    val whole = epochs.map { case (k, e) => k -> math.floor(e).toLong }
    val thr = epochs.map { case (k, e) =>
      k -> math.floor((e - math.floor(e)) * Buckets).toLong }
    val stratum = col(strataCol).cast("string")
    val repeats =
      coalesce(element_at(typedLit(whole), stratum), lit(0L)) +
        when(hashBucket(col(idCol), salt) <
          coalesce(element_at(typedLit(thr), stratum), lit(0L)), 1L).otherwise(0L)
    df.filter(stratum.isin(epochs.keys.toSeq: _*))
      .withColumn("__rep", repeats)
      .filter(col("__rep") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("__rep") - 1)))
      .drop("__rep")
  }

  /** Rebalance a corpus to a TARGET MIXTURE: given integer weights per
    * stratum (e.g. source/language shares for a training mix), compute the
    * largest output that hits the exact target proportions without
    * upsampling any stratum, and keep each stratum's share by
    * deterministic hash-bucket sampling.
    *
    * With W = Σw and per-stratum counts c_k, the output size is
    * `nOut = min_k (c_k · W / w_k)` (the binding stratum keeps everything)
    * and stratum k keeps `w_k · nOut / W` rows via bucket threshold
    * `thr_k = B · w_k · nOut / (W · c_k)` — all integer arithmetic
    * (BigInt, so 100 TB-scale counts can't overflow), so the kept set is a
    * pure function of (id, salt, weights, counts). Strata missing from
    * `weights` are dropped (weight 0).
    *
    * The per-stratum counts are ONE tiny aggregate collected to the driver
    * — strata are things like languages or crawl sources (dozens), never
    * high-cardinality; the corpus itself is only touched by the narrow
    * hash filter. */
  def mixtureRebalance(df: DataFrame, idCol: String, strataCol: String,
      weights: Map[String, Long], salt: String = "mixture"): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "mixture weights must be positive")
    rebalanceCore(df, idCol, strataCol, weights,
      countStrata(df, strataCol, weights.keys.toSeq), salt)
  }

  /** α=0.5 temperature rebalancing — the standard multilingual data-mix
    * flattening (sample stratum s proportionally to count^α): target
    * weights are the integer square roots of the observed stratum counts,
    * fed through [[mixtureRebalance]]'s exact integer threshold machinery.
    * Dominant strata shrink, tail strata keep (relatively) more — without
    * anyone hand-picking the weights.
    *
    * α is pinned to 1/2 on purpose: IEEE `sqrt` is correctly-rounded by
    * the standard, so `floor(sqrt(count))` is the SAME integer on every
    * engine and the oracle can replay the whole derivation — a general
    * `pow(count, α)` has no such guarantee across libm implementations.
    * One count pass (collect bounded by #strata), then a narrow filter:
    * identical shape to [[mixtureRebalance]]. */
  def temperatureRebalance(df: DataFrame, idCol: String, strataCol: String,
      strata: Seq[String], salt: String = "mixture"): DataFrame = {
    require(strata.nonEmpty, "need at least one stratum")
    val counts = countStrata(df, strataCol, strata)
    val weights = strata.flatMap(k => counts.get(k).filter(_ > 0)
      .map(c => k -> math.max(math.sqrt(c.toDouble).toLong, 1L))).toMap
    require(weights.nonEmpty, "no rows in any requested stratum")
    rebalanceCore(df, idCol, strataCol, weights, counts, salt)
  }

  private def countStrata(df: DataFrame, strataCol: String,
      keys: Seq[String]): Map[String, Long] = df
    .filter(col(strataCol).isin(keys: _*))
    .groupBy(col(strataCol)).count()
    .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def rebalanceCore(df: DataFrame, idCol: String, strataCol: String,
      weights: Map[String, Long], counts: Map[String, Long],
      salt: String): DataFrame = {
    val wTotal = weights.values.sum
    val nOut = weights.collect {
      case (k, wk) if counts.getOrElse(k, 0L) > 0 => counts(k) * wTotal / wk
    }.min
    val thr = weights.map { case (k, wk) =>
      k -> (BigInt(Buckets) * wk * nOut /
        (BigInt(wTotal) * counts.getOrElse(k, 1L).max(1L))).toLong
    }
    val thrCol = thr.foldLeft(lit(0L): Column) { case (acc, (k, t)) =>
      when(col(strataCol) === k, lit(t)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol), salt) < thrCol)
  }

  /** Cap each group at `k` rows, deterministically: keep the k rows with
    * the smallest salted hash (ties by id) per group — the per-domain /
    * per-source document cap every crawl pipeline applies so no single
    * host dominates the training mix. Which rows survive is a pure
    * function of (id, salt), not of partitioning or arrival order.
    *
    * Plan shape: the rank ≤ k filter compiles to WindowGroupLimit, which
    * keeps a k-row heap per group on the MAP side before the exchange —
    * at 100 TB the shuffle carries at most k rows per (partition, group),
    * not the whole corpus. */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String, k: Int,
      salt: String = "cap"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(hashBucket(col(idCol), salt).asc, col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Deterministic fixed-size sample: the `n` rows with the smallest salted
    * hash — a reproducible stand-in for reservoir sampling (same marginal
    * uniformity, but re-runnable and mergeable: the global top-n of a
    * uniform hash is a TakeOrdered, no reservoir state, no shuffle of the
    * losers at 100 TB). */
  /** Weighted (probability-proportional-to-size) Poisson sampling: each
    * row is kept independently with inclusion probability
    * `p_i = min(1, n·w_i / ΣW)` — the classic πps design whose sample size
    * concentrates around `n` and whose `1/p_i` Horvitz–Thompson weights
    * give unbiased total estimates. Canonical pipeline use: sample
    * documents proportional to length/token count so the SAMPLE holds the
    * same token mass per stratum the corpus does.
    *
    * The inclusion test is EXACT integer arithmetic, never a float:
    * keep ⟺ `hash55(id:salt) · ΣW < n · w_i · 2^55`, evaluated in
    * DECIMAL(38,0) (fits up to petabyte-scale weight totals: hash < 2^55
    * ≈ 3.6e16 times ΣW ≤ 1e21 stays under 1e38). min(1,·) is automatic —
    * when `n·w_i ≥ ΣW` the right side exceeds the hash ceiling times ΣW.
    * The same salted-portable-hash discipline as [[sample]]: identical
    * results under any partitioning, retry, or engine; doubling every
    * weight provably leaves the selected set unchanged (both sides scale).
    *
    * Scale shape: ΣW is a 1-row aggregate broadcast back; the corpus side
    * is a narrow map-side filter — zero shuffles. Null or non-positive
    * weights are never selected (p_i = 0). `p_incl` (one IEEE division)
    * rides along for downstream HT reweighting.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String, n: Long,
      salt: String = "wsample"): DataFrame = {
    require(n > 0, s"weightedSample needs a positive target size, got $n")
    val d19 = "decimal(19,0)"
    val tot = df.agg(
      sum(when(col(weightCol) > 0, col(weightCol)).otherwise(0L).cast("decimal(28,0)"))
        .as("__wtot"))
    val h = PolyHash56(concat(col(idCol).cast("string"), lit(":" + salt)))
    df.crossJoin(broadcast(tot))
      .filter(col(weightCol).isNotNull && col(weightCol) > 0 &&
        h.cast(d19) * col("__wtot").cast("decimal(28,0)") <
          lit(n).cast(d19) * col(weightCol).cast(d19) *
            lit(36028797018963968L).cast(d19)) // 2^55: the hash ceiling
      .withColumn("p_incl", least(lit(1.0),
        lit(n.toDouble) * col(weightCol).cast("double") / col("__wtot").cast("double")))
      .drop("__wtot")
  }

  def deterministicReservoir(df: DataFrame, idCol: String, n: Int,
      salt: String = "reservoir"): DataFrame =
    df.withColumn("__hb", hashBucket(col(idCol), salt))
      .orderBy(col("__hb").asc, col(idCol).asc)
      .limit(n)
      .drop("__hb")

  /** Curriculum phase assignment: order each group by a difficulty score
    * (canonically document length — the short-to-long curriculum) and
    * bucket into `nPhases` NTILE phases, with `pct_rank` as the
    * continuous position. Ties break on id, so phases are deterministic
    * under any partitioning.
    *
    * The window partitions by `groupCols` — per-group frames, a real
    * exchange-parallel plan. For a GROUP too large for one partition's
    * sort, swap the NTILE for broadcast quantile thresholds (the
    * [[graft.x.Profiler.winsorize]] pattern: one agg → nPhases-1 cut
    * points → a narrow projection); the phase semantics stay the same,
    * which is why the cut-point variant isn't duplicated here. */
  def curriculumPhases(df: DataFrame, scoreCol: String, idCol: String,
      groupCols: Seq[String], nPhases: Int): DataFrame = {
    require(nPhases >= 1, s"nPhases must be >= 1, got $nPhases")
    require(groupCols.nonEmpty,
      "curriculumPhases needs group columns (a global NTILE is a one-partition sort)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col(scoreCol).asc, col(idCol).asc)
    df.withColumn("phase", ntile(nPhases).over(w))
      .withColumn("pct_rank", percent_rank().over(w))
  }

  /** Rendezvous (highest-random-weight) shard routing: each id goes to
    * `argmax over s in [0, shards) of hash(id # s)` (ties → smallest s).
    * The property plain `hash(id) mod N` lacks: growing N → N+1 moves
    * ONLY the ids whose new shard wins the argmax (≈ 1/(N+1) of them) —
    * every other assignment is untouched, because each (id, s) weight is
    * independent of N. That is the stable routing a 100 TB ingest wants
    * for shard/bucket/store assignment under topology change (Thaler &
    * Ravishankar 1996, the scheme behind most distributed caches).
    * Narrow: the argmax unrolls to a codegen'd greatest-of-N over N
    * hash expressions — no explode, no shuffle. */
  def rendezvousShard(id: Column, shards: Int): Column = {
    require(shards >= 1 && shards <= 64, s"shards $shards outside [1,64]")
    if (shards == 1) return lit(0L)
    // md5, NOT hashBucket's polynomial: HRW compares weights ACROSS salts
    // of the SAME id, and a poly hash of inputs differing only in the
    // shard digit yields CONSECUTIVE weights (the last shard always wins
    // — measured). Same avalanche requirement as x/Sketches' rank bits.
    // 8 hex chars = 32 uniform bits, plenty of weight resolution.
    def w(s: Int): Column = conv(substring(
      md5(concat(id.cast("string"), lit(s":shard$s"))), 1, 8), 16, 10)
      .cast("long")
    // greatest() on structs orders lexicographically: max weight first;
    // the shard id is negated so WEIGHT ties resolve to the smallest shard
    val negged = (0 until shards).map { s =>
      struct(w(s).as("w"), lit(-s.toLong).as("ns"))
    }
    (-greatest(negged: _*).getField("ns")).cast("long")
  }
}
