package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.x.{Sampling, TextAnalysis}

/** Invariants for the deterministic sampling / splitting / packing / tfidf
  * operators (round-2 additions to SURVEY.md §2.9). */
class SamplingPackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

  test("deterministic sample is reproducible and near the target fraction") {
    val a = Sampling.sample(docs, "doc_id", 0.3).select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.sample(docs, "doc_id", 0.3).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "same salt + fraction must select identical rows")
    val n = docs.count().toDouble
    assert(math.abs(a.size / n - 0.3) < 0.08, s"got fraction ${a.size / n}")
    // monotone: a smaller fraction selects a subset of a larger one
    val small = Sampling.sample(docs, "doc_id", 0.1).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(a))
  }

  test("tokenBudgetSelect equals the single-window reference; edges exact") {
    import spark.implicits._
    // hand-sized frame with priority ties and an exact-fill boundary
    val rows = Seq(
      (1L, 10L, 0.9), (2L, 20L, 0.9), (3L, 30L, 0.8), (4L, 25L, 0.8),
      (5L, 40L, 0.7), (6L, 5L, 0.7), (7L, 100L, 0.6), (8L, 1L, 0.5))
    val df = rows.toDF("id", "toks", "pri").repartition(5) // layout-hostile
    def brute(budget: Long): Seq[(Long, Long)] = {
      // scalar reference: order (pri desc, id), inclusive cumsum, cut
      val ordered = rows.sortBy { case (id, _, p) => (-p, id) }
      ordered.scanLeft((0L, 0L)) { case ((_, cum), (id, t, _)) => (id, cum + t) }
        .tail.filter(_._2 <= budget)
    }
    for (budget <- Seq(0L, 10L, 30L, 60L, 85L, 130L, 231L, 1000L)) {
      val got = Sampling.tokenBudgetSelect(df, "id", "toks", "pri", budget)
        .select("id", "cum_tokens").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      assert(got == brute(budget).sortBy(_._1),
        s"budget $budget: got $got, want ${brute(budget)}")
    }
    // exact fill: budget 85 = 10+20+30+25 keeps ids 1,2,3,4 and excludes
    // the crossing doc 5 rather than truncating it
    val exact = Sampling.tokenBudgetSelect(df, "id", "toks", "pri", 85L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(exact == Set(1L, 2L, 3L, 4L))
    // ties split by id: within pri=0.8, id 3 (30 toks) precedes id 4
    val tie = Sampling.tokenBudgetSelect(df, "id", "toks", "pri", 60L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(tie == Set(1L, 2L, 3L), s"tie order broke: $tie")
  }

  test("epochMixture: floor+fractional repeats per stratum, deterministic") {
    val out = Sampling.epochMixture(docs.select("doc_id", "lang"),
      "doc_id", "lang", Map("en" -> 2.5, "de" -> 1.0, "fr" -> 0.25)).cache()
    val byDoc = out.groupBy("doc_id", "lang").count().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // en: every doc 2 or 3 copies, ~half get the third
    val en = byDoc.filter(_._2 == "en")
    assert(en.forall(d => d._3 == 2 || d._3 == 3))
    val enFrac = en.count(_._3 == 3).toDouble / en.length
    assert(math.abs(enFrac - 0.5) < 0.15, s"en third-epoch share $enFrac")
    // de: exactly once; fr: ~25% appear, never twice; es/zh: dropped
    assert(byDoc.filter(_._2 == "de").forall(_._3 == 1))
    val frBase = docs.filter(col("lang") === "fr").count().toDouble
    val fr = byDoc.filter(_._2 == "fr")
    assert(fr.forall(_._3 == 1) && math.abs(fr.length / frBase - 0.25) < 0.15)
    assert(!byDoc.exists(d => d._2 == "es" || d._2 == "zh"))
    // epoch indices dense 0..rep-1 and the whole assignment reproducible
    val epochs = out.filter(col("doc_id") === en.head._1)
      .select("epoch").collect().map(_.getLong(0)).sorted
    assert(epochs.sameElements(0L until en.head._3))
    val again = Sampling.epochMixture(docs.select("doc_id", "lang"),
      "doc_id", "lang", Map("en" -> 2.5, "de" -> 1.0, "fr" -> 0.25))
      .groupBy("doc_id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc.map(d => d._1 -> d._3).toMap == again)
    out.unpersist()
  }

  test("stratified sample applies per-stratum fractions") {
    val out = Sampling.stratifiedSample(docs, "doc_id", "lang", Map("en" -> 0.5, "zh" -> 0.0))
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byLang.contains("zh"), "zh fraction 0 must drop every zh doc")
    assert(byLang("en") < base("en"), "en must be downsampled")
    assert(byLang("de") == base("de"), "unlisted strata keep everything")
  }

  test("train/test split is disjoint, exhaustive, and row-stable") {
    val out = Sampling.trainTestSplit(docs, "doc_id", 0.2, 0.1).cache()
    assert(out.count() == docs.count(), "split adds a column, never drops rows")
    val frac = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1) / docs.count().toDouble).toMap
    assert(math.abs(frac("test") - 0.2) < 0.06, s"test=${frac("test")}")
    assert(math.abs(frac.getOrElse("validation", 0.0) - 0.1) < 0.05)
    // membership independent of the sample decision (different salts)
    val sampled = Sampling.sample(docs, "doc_id", 0.5)
    val resplit = Sampling.trainTestSplit(sampled, "doc_id", 0.2, 0.1)
      .filter(col("split") === "test").select("doc_id").collect().map(_.getLong(0)).toSet
    val full = out.filter(col("split") === "test").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(resplit.subsetOf(full), "a row's split must not depend on which rows survive sampling")
    out.unpersist()
  }

  test("sequence packing keeps packs within budget + one chunk and preserves order") {
    val chunks = TextAnalysis.chunkDocuments(docs, "text", "doc_id", 30, 5)
      .withColumn("shard", pmod(col("doc_id"), lit(8)))
    val packed = TextAnalysis.packSequences(chunks, "shard", Seq("doc_id", "chunk_index"),
      "chunk_tokens", maxTokens = 512)
    val totals = packed.groupBy("shard", "pack_id")
      .agg(sum("chunk_tokens").as("tok"), max("chunk_tokens").as("mx"))
      .collect()
    totals.foreach { r =>
      assert(r.getAs[Long]("tok") <= 512L + r.getAs[Int]("mx").toLong,
        s"pack ${r} exceeds budget + one chunk")
    }
    // offsets restart per pack and stay under the budget
    assert(packed.filter(col("pack_offset") >= 512 || col("pack_offset") < 0).count() == 0)
    // pack ids are contiguous from 0 within each shard
    val perShard = packed.groupBy("shard").agg(
      min("pack_id").as("mn"), countDistinct("pack_id").as("d"), max("pack_id").as("mx")).collect()
    perShard.foreach(r => assert(r.getAs[Long]("mn") == 0L &&
      r.getAs[Long]("mx") == r.getAs[Long]("d") - 1))
  }

  test("connected components merge chains and leave singleton pairs alone") {
    import spark.implicits._
    // two components: a 4-chain {1,2,3,4} and an isolated pair {10,11}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val comp = graft.x.Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(comp(_) == 1L), s"chain must collapse to 1: $comp")
    assert(comp(10L) == 10L && comp(11L) == 10L)
    // order-insensitivity: reversed edge directions give the same labels
    val rev = graft.x.Dedup.connectedComponents(
      pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rev == comp)
    // the distributed label-propagation fallback (driverThreshold = 0)
    // produces identical labels to the driver union-find fast path
    val dist = graft.x.Dedup.connectedComponents(pairs, driverThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == comp, s"paths diverged: driver=$comp distributed=$dist")
  }

  test("epoch shuffle: partitioning-invariant; epochs decorrelate; positions dense") {
    val e0 = Sampling.shuffleShards(docs, "doc_id", nShards = 8)
      .select("doc_id", "shard", "pos")
    val e0b = Sampling.shuffleShards(docs.repartition(17), "doc_id", nShards = 8)
      .select("doc_id", "shard", "pos")
    assert(e0.exceptAll(e0b).isEmpty && e0b.exceptAll(e0).isEmpty,
      "permutation must not depend on input partitioning")
    // per-shard positions are dense 0..n_s-1
    val bad = e0.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"))
      .filter(col("mx") =!= col("n") - 1 || col("mn") =!= 0).count()
    assert(bad == 0)
    // a new salt is a genuinely different permutation: most docs move shard
    val e1 = Sampling.shuffleShards(docs, "doc_id", nShards = 8, salt = "epoch1")
      .select(col("doc_id"), col("shard").as("shard1"))
    val same = e0.join(e1, "doc_id").filter(col("shard") === col("shard1")).count()
    val total = docs.count()
    assert(same.toDouble / total < 0.3, s"$same/$total kept their shard across epochs")
  }

  test("kmeans step: means are partitioning-independent and centroid-attracting") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val centroids = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("centroid_id"), col("embedding"))
    val m1 = graft.x.Similarity.kmeansStep(emb, centroids, "vec_id", "centroid_id", "embedding")
      .orderBy("cell", "dim").collect()
    val m2 = graft.x.Similarity.kmeansStep(emb.repartition(17), centroids,
        "vec_id", "centroid_id", "embedding")
      .orderBy("cell", "dim").collect()
    assert(m1.sameElements(m2), "means must not depend on input partitioning")
    assert(m1.length == 10 * 64, "10 cells x 64 dims")
    // every cell kept at least its own centroid vector
    m1.foreach(r => assert(r.getAs[Long]("n") >= 1L))
  }

  test("tfidf: df counts docs containing the term; rare terms outweigh common ones") {
    val out = TextAnalysis.tfidf(docs, "text", "doc_id").cache()
    val n = docs.count()
    val theRow = out.filter(col("term") === "the").select("dfreq").head()
    assert(theRow.getLong(0) > n / 4, "'the' should appear in many docs")
    // same tf ⇒ the rarer term scores strictly higher
    val sameTf = out.as("a").join(out.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.tf") === col("b.tf") &&
        col("a.dfreq") < col("b.dfreq"))
      .select(col("a.tfidf").as("rare"), col("b.tfidf").as("common"))
      .limit(50).collect()
    assert(sameTf.nonEmpty)
    sameTf.foreach(r => assert(r.getDouble(0) > r.getDouble(1)))
    out.unpersist()
  }

  test("tokenBudget: shares sum to 1, cumulative share is monotone, rank follows tokens desc") {
    val out = TextAnalysis.tokenBudget(docs, "text", Seq("lang"))
      .orderBy("rank").collect()
    assert(out.nonEmpty)
    val shares = out.map(_.getAs[Double]("share"))
    assert(math.abs(shares.sum - 1.0) < 1e-9)
    val cums = out.map(_.getAs[Double]("cum_share"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    assert(math.abs(cums.last - 1.0) < 1e-9)
    val toks = out.map(_.getAs[Long]("tokens"))
    assert(toks.zip(toks.tail).forall { case (a, b) => a >= b },
      "rank order must be descending tokens")
    // docs are conserved across the report
    assert(out.map(_.getAs[Long]("docs")).sum == docs.count())
  }

  test("bm25TopK: a doc's own distinctive text retrieves it first; repeated query terms don't double-weight") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha alpha alpha common words here"),
      (3L, "zeta eta theta iota kappa"),
      (4L, "common words here and more common words")).toDF("doc_id", "text")
    val qs = Seq((10L, "zeta eta theta"), (11L, "zeta zeta zeta eta theta"))
      .toDF("q_id", "q_text")
    val out = TextAnalysis.bm25TopK(corpus, qs, "text", "doc_id", "q_text", "q_id", k = 3)
      .cache()
    // the uniquely-matching doc ranks first for its own terms
    val top10 = out.filter(col("q_id") === 10 && col("rank") === 1).head()
    assert(top10.getAs[Long]("doc_id") == 3L)
    assert(top10.getAs[Long]("matched_terms") == 3L)
    // query-term dedup: q11 repeats 'zeta' but must score identically to q10
    val s10 = out.filter(col("q_id") === 10).select("doc_id", "score", "rank").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSet
    val s11 = out.filter(col("q_id") === 11).select("doc_id", "score", "rank").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSet
    assert(s10 == s11, "bag-of-words query semantics: term multiplicity is ignored")
    out.unpersist()
    // rank<=k must compile to WindowGroupLimit (map-side per-query top-k
    // heap BEFORE the exchange — the ranking never moves the full match list)
    val plan = TextAnalysis.bm25TopK(corpus, qs, "text", "doc_id", "q_text", "q_id", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"))
  }

  test("skipgramPairs: exact window pairs with subsampling off; layout-invariant with it on") {
    import spark.implicits._
    val tiny = Seq((1L, "a b c d"), (2L, "a b")).toDF("doc_id", "text")
    // t huge → keep-prob 1 everywhere → pure windowed pair extraction
    val full = TextAnalysis.skipgramPairs(tiny, "text", "doc_id", window = 2, subsampleT = 1e9)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(full(("a", "b")) == 2 && full(("b", "a")) == 2) // once per doc
    assert(full(("a", "c")) == 1 && full(("c", "a")) == 1)
    assert(!full.contains(("a", "d")), "window 2 must not reach distance 3")
    assert(full.values.sum == 12L) // doc1: 10 ordered pairs, doc2: 2
    // subsampling on: the salted-hash drop must be layout-invariant and thin
    val corpus = (1L to 40L)
      .map(i => (i, ("the quick the fox the dog " * 8).trim)).toDF("doc_id", "text")
    val a = TextAnalysis.skipgramPairs(corpus.repartition(7), "text", "doc_id", 2, 1e-3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val b = TextAnalysis.skipgramPairs(corpus.coalesce(1), "text", "doc_id", 2, 1e-3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(a == b, "hash-salted subsample must not depend on partitioning")
    val nFull = TextAnalysis.skipgramPairs(corpus, "text", "doc_id", 2, 1e9)
      .agg(sum("cnt")).head.getLong(0)
    val nSub = TextAnalysis.skipgramPairs(corpus, "text", "doc_id", 2, 1e-3)
      .agg(sum("cnt")).head.getLong(0)
    assert(nSub < nFull, "aggressive t must drop pairs")
  }

  test("curriculumPhases: balanced monotone phases, deterministic under layout") {
    import spark.implicits._
    val docs = (0 until 23).map(i => (i.toLong, "g", (i * 7) % 100L))
      .toDF("id", "grp", "score")
    val out = Sampling.curriculumPhases(docs, "score", "id", Seq("grp"), nPhases = 4)
      .select("id", "score", "phase", "pct_rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    // balanced: NTILE sizes differ by at most one (23 = 6+6+6+5)
    val sizes = out.groupBy(_._3).view.mapValues(_.size).toMap
    assert(sizes.values.toSeq.sorted == Seq(5, 6, 6, 6))
    // monotone: a higher score never lands in an earlier phase
    val byScore = out.sortBy(t => (t._2, t._1))
    assert(byScore.map(_._3).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
    assert(byScore.head._4 == 0.0 && byScore.last._4 == 1.0)
    // physical layout cannot move a document's phase
    val again = Sampling.curriculumPhases(docs.repartition(7), "score", "id",
        Seq("grp"), nPhases = 4)
      .select("id", "phase").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(again == out.map(t => (t._1, t._3)).toSet)
  }

  test("rendezvousShard: balanced-ish, and growing the ring moves only ~1/(N+1)") {
    val routed8 = docs.select(col("doc_id"),
        Sampling.rendezvousShard(col("doc_id"), 8).as("s8"),
        Sampling.rendezvousShard(col("doc_id"), 9).as("s9"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = routed8.length
    // every shard used, no pathological imbalance (uniform-ish weights)
    val bySizes = routed8.groupBy(_._2).view.mapValues(_.length)
    assert(bySizes.size == 8)
    assert(bySizes.values.max < n / 8 * 3)
    // THE rendezvous property: 8→9 shards, ids either keep their shard
    // or move to the NEW shard 8 — never shuffle among the old shards
    val moved = routed8.filter { case (_, a, b) => a != b }
    assert(moved.forall(_._3 == 8L), "a rerouted id landed on an old shard")
    assert(moved.length < n / 4, s"${moved.length}/$n moved; expected ~1/9")
    assert(moved.nonEmpty)
  }
}
