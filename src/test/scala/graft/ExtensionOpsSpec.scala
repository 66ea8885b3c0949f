package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.x.{Dedup, Multimodal, Privacy, Profiler, Sampling, Similarity, TextAnalysis}

/** Extension operators (SURVEY.md §2.9): dedup family, similarity search,
  * text analysis, multimodal plumbing. */
class ExtensionOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  val sf = TestSpark.sfDir

  lazy val docs = spark.read.parquet(s"$sf/documents.parquet").cache()
  lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet").cache()

  test("hillTailIndex: hand-checked alpha on planted frequencies") {
    // freqs: a=8, b=4, c=2, d=1; k=2 -> boundary x3 = 2,
    // alpha = 2 / (ln(8/2) + ln(4/2)) = 2 / (3 ln 2)
    val text = (Seq.fill(8)("a") ++ Seq.fill(4)("b") ++
      Seq.fill(2)("c") ++ Seq("d")).mkString(" ")
    val r = TextAnalysis.hillTailIndex(Seq(text).toDF("text"), "text", k = 2)
      .head()
    assert((r.getInt(0), r.getLong(1), r.getLong(2)) === ((2, 4L, 2L)))
    assert(math.abs(r.getDouble(3) - 12.0 / 15.0) < 1e-6, "head share 12/15")
    val q = (v: Double) => BigDecimal(v).setScale(8,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val expAlpha = 2.0 / (q(math.log(4.0)) + q(math.log(2.0)))
    assert(math.abs(r.getDouble(4) - expAlpha) < 1e-6,
      s"alpha ${r.getDouble(4)} vs $expAlpha")
    // vocabulary smaller than k: degrades to NULL alpha, never throws
    val small = TextAnalysis.hillTailIndex(Seq("x y").toDF("text"), "text",
      k = 5).head()
    assert(small.isNullAt(4))
  }

  test("textRankKeywords: the hub word outranks spokes; layout-invariant") {
    // star-shaped co-occurrence: "hub" is adjacent to every spoke word,
    // spokes only ever touch hub — classic TextRank centrality shape
    val docsDf = Seq(
      (1L, "alpha hub beta hub gamma"),
      (2L, "delta hub epsilon"),
      (3L, "hub zeta hub alpha"),
      (4L, "beta hub delta")).toDF("doc_id", "text")
    val got = TextAnalysis.textRankKeywords(docsDf, "text", "doc_id",
        iters = 4, topK = 5).collect()
    assert(got.head.getString(0) === "hub",
      s"hub must rank first, got ${got.map(_.getString(0)).toSeq}")
    // strictly above every spoke, not tied
    assert(got.tail.forall(_.getLong(1) < got.head.getLong(1)))
    val again = TextAnalysis.textRankKeywords(docsDf.repartition(7), "text",
        "doc_id", iters = 4, topK = 5).collect()
    assert(again.map(_.toString).toSeq === got.map(_.toString).toSeq)
  }

  test("ngramCounts slides n-token windows and applies the count floor") {
    val df = Seq("a b c a b c", "a b x", "", "a").toDF("text")
    val all = graft.x.TextAnalysis.ngramCounts(df, "text", n = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "a b c a b c" → ab, bc, ca, ab, bc; "a b x" → ab, bx; short/empty drop
    assert(all === Map("a b" -> 3L, "b c" -> 2L, "c a" -> 1L, "b x" -> 1L))
    val floored = graft.x.TextAnalysis.ngramCounts(df, "text", n = 2, minCount = 2L)
      .collect().map(r => r.getString(0)).toSet
    assert(floored === Set("a b", "b c"))
  }

  test("editDistancePairs finds typo-level pairs only within blocks") {
    val df = Seq(
      (1L, "the quick brown fox", "s1"),
      (2L, "the quick brwon fox", "s1"),  // transposition: dist 2
      (3L, "completely different text here", "s1"),
      (4L, "the quick brown fox", "s2")   // identical to 1 but other block
    ).toDF("doc_id", "text", "source")
    val pairs = graft.x.Dedup.editDistancePairs(df, "text", "doc_id", "source", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(pairs === Seq((1L, 2L, 2)))
  }

  test("topTermsPerGroup ranks by count with deterministic term ties") {
    val df = Seq(
      ("en", "a a a b b c"), ("en", "b"), ("fr", "x y x")
    ).toDF("lang", "text")
    val top = graft.x.TextAnalysis.topTermsPerGroup(df, "text", "lang", k = 2)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3))).toSet
    assert(top === Set(
      ("en", 1, "a", 3L), ("en", 2, "b", 3L), // tie a/b broken by term asc
      ("fr", 1, "x", 2L), ("fr", 2, "y", 1L)))
    val plan = graft.x.TextAnalysis.topTermsPerGroup(docs, "text", "lang", k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"))
  }

  test("exact dedup is deterministic and idempotent") {
    val d1 = Dedup.exactByContent(docs, "text", "doc_id")
    val d2 = Dedup.exactByContent(d1, "text", "doc_id")
    assert(d1.count() == d2.count())
    assert(d1.select("doc_id").exceptAll(d2.select("doc_id")).isEmpty)
    // keeps the minimum doc_id per text
    val viaGroup = docs.groupBy("text").agg(min("doc_id").as("doc_id")).count()
    assert(d1.count() == viaGroup)
  }

  test("paragraphDedup keeps the first occurrence corpus-wide and reassembles in order") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "unique alpha\n\nshared boilerplate\n\nunique beta"),
      (2L, "shared boilerplate\n\nunique gamma"),
      (3L, "shared boilerplate"),
      (4L, "  \n\nunique delta")).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(corpus, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1 is the boilerplate's first occurrence: keeps everything, in order
    assert(out(1L) == (("unique alpha\n\nshared boilerplate\n\nunique beta", 3L, 3L)))
    // later docs lose the shared paragraph but keep their unique prose
    assert(out(2L) == (("unique gamma", 1L, 2L)))
    // a doc that was ONLY boilerplate comes back empty but stays auditable
    assert(out(3L) == (("", 0L, 1L)))
    // whitespace-only paragraphs are dropped before the election
    assert(out(4L) == (("unique delta", 1L, 1L)))
    // idempotent: re-running over the deduped corpus changes nothing
    val again = Dedup.paragraphDedup(
      Dedup.paragraphDedup(corpus, "text", "doc_id"), "text", "doc_id")
    assert(again.filter(col("kept_paras") =!= col("total_paras")).isEmpty)
  }

  test("minhash-LSH near-dup pairs ⊆ exact jaccard pairs, with high recall") {
    val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id", n = 3, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Dedup.minhashNearDupPairs(docs, "text", "doc_id",
      n = 3, k = 32, bands = 8, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx.subsetOf(exact), "LSH+verify must not emit false positives")
    if (exact.nonEmpty)
      assert(approx.size.toDouble / exact.size >= 0.8, s"recall ${approx.size}/${exact.size}")
  }

  test("incremental dedup admits only never-seen content and replays as a no-op") {
    val store = java.nio.file.Files
      .createTempDirectory("fp_store_spec").resolve("fps").toString
    val day1 = Seq((1L, "the quick brown fox"), (2L, "jumped over lazy dogs"),
      (3L, "the quick brown fox")).toDF("doc_id", "text") // 3 dups 1 in-batch
    val a1 = Dedup.incrementalExact(day1, "text", "doc_id", store)
    assert(a1.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    // day 2: one old content (different id), one genuinely new
    val day2 = Seq((10L, "the quick brown fox"), (11L, "completely new content today"))
      .toDF("doc_id", "text")
    val a2 = Dedup.incrementalExact(day2, "text", "doc_id", store)
    assert(a2.select("doc_id").as[Long].collect().toSeq == Seq(11L))
    // at-least-once replay of day 2: every fingerprint already committed
    val a2again = Dedup.incrementalExact(day2, "text", "doc_id", store)
    assert(a2again.count() == 0)
    // the store carries hashes only — 8 bytes per admitted doc, never text
    val st = graft.sources.VersionedParquet.read(spark, store)
    assert(st.columns.toSeq == Seq("__fp") && st.count() == 3)
  }

  test("incremental dedup: null text admits once; persistAdmitted runs before store commit") {
    val store = java.nio.file.Files
      .createTempDirectory("fp_store_null").resolve("fps").toString
    // NULL text must not produce a NULL store key (which would never match
    // the left_anti probe and re-admit forever): it fingerprints as ""
    val day1 = Seq((1L, null.asInstanceOf[String]), (2L, "real content here"))
      .toDF("doc_id", "text")
    assert(Dedup.incrementalExact(day1, "text", "doc_id", store)
      .select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    val day2 = Seq((10L, null.asInstanceOf[String]), (11L, "")).toDF("doc_id", "text")
    // replayed null AND empty text are the already-admitted "" class
    assert(Dedup.incrementalExact(day2, "text", "doc_id", store).count() == 0)
    // two-phase ordering: the durable persist of admitted rows runs BEFORE
    // the fingerprint commit — a crash inside persistAdmitted leaves the
    // store untouched, so the replay re-admits the same batch (at-least-once)
    val store2 = java.nio.file.Files
      .createTempDirectory("fp_store_2pc").resolve("fps").toString
    val batch = Seq((1L, "only seen once")).toDF("doc_id", "text")
    intercept[RuntimeException] {
      Dedup.incrementalExact(batch, "text", "doc_id", store2,
        persistAdmitted = _ => throw new RuntimeException("crash mid-write"))
    }
    assert(graft.sources.VersionedParquet.versions(store2).isEmpty,
      "fingerprints must not commit before the admitted output is durable")
    var persisted = 0L
    val replay = Dedup.incrementalExact(batch, "text", "doc_id", store2,
      persistAdmitted = df => persisted = df.count())
    assert(replay.count() == 1 && persisted == 1L, "replay re-admits the batch")
  }

  test("containment catches partial copies that Jaccard structurally misses") {
    val small = "alpha beta gamma delta epsilon zeta eta theta"
    val big = small + " " + (1 to 80).map(i => s"filler$i").mkString(" ")
    val df = Seq((1L, small), (2L, big), (3L, "unrelated words entirely here today"))
      .toDF("doc_id", "text")
    // doc 1 is fully quoted inside doc 2: Jaccard ≈ 6/85 — invisible at
    // any useful threshold — but containment is 1.0
    val jac = Dedup.ngramJaccardPairs(df, "text", "doc_id", n = 3, threshold = 0.5)
    assert(jac.count() == 0)
    val cont = Dedup.containmentPairs(df, "text", "doc_id", n = 3, threshold = 0.9)
      .collect()
    assert(cont.length == 1)
    assert(cont.head.getLong(0) == 1L && cont.head.getLong(1) == 2L)
    assert(cont.head.getDouble(2) == 1.0)
  }

  test("repeatedPassages emits maximal cross-doc extents, capped and auditable") {
    val common = (1 to 10).map(i => s"c$i").mkString(" ") // 10-token passage
    val df = Seq(
      (1L, s"a1 a2 a3 $common z1"),                   // passage at tokens [3,13)
      (2L, s"b1 $common y1 y2"),                      // passage at tokens [1,11)
      (3L, (1 to 11).map(i => s"d$i").mkString(" ")), // no repeats
      // 7-token overlap with the passage: below the L=8 window, invisible
      (4L, "e1 c1 c2 c3 c4 c5 c6 c7 e2")).toDF("doc_id", "text")
    val ext = Dedup.repeatedPassages(df, "text", "doc_id", windowTokens = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getLong(4))).toSet
    // a 10-token shared span = 3 consecutive hit windows merging into ONE
    // extent of exactly the span, per host doc
    assert(ext == Set((1L, 3, 13, 10, 3L), (2L, 1, 11, 10, 3L)))
    // minDocs above the passage's doc count: nothing repeats enough
    assert(Dedup.repeatedPassages(df, "text", "doc_id", windowTokens = 8,
      minDocs = 3).isEmpty)
    // reporting cap: an 8-token passage in 5 docs vanishes from extents at
    // maxFreq=4 and surfaces once through the audit instead
    val boiler = (10L to 14L).map(i => (i, s"x$i " + (1 to 8).map(j => s"p$j").mkString(" ")))
      .toDF("doc_id", "text")
    assert(Dedup.repeatedPassages(boiler, "text", "doc_id", windowTokens = 8,
      maxFreq = 4).isEmpty)
    val hot = Dedup.hotPassages(boiler, "text", "doc_id", windowTokens = 8,
      maxFreq = 4).collect()
    assert(hot.length == 1 && hot.head.getLong(1) == 5L)
    // and a cap nothing exceeds is identical to uncapped
    val capped = Dedup.repeatedPassages(boiler, "text", "doc_id", windowTokens = 8,
      maxFreq = 5)
    val un = Dedup.repeatedPassages(boiler, "text", "doc_id", windowTokens = 8,
      maxFreq = Int.MaxValue)
    assert(capped.exceptAll(un).isEmpty && un.exceptAll(capped).isEmpty)
  }

  test("hashedLinearScore: broadcast model, sparse buckets score zero, exact mean") {
    import spark.implicits._
    import graft.functions.PolyHash56
    val corpus = Seq((1L, "good good"), (2L, "bad"), (3L, "good unknown")).toDF("doc_id", "text")
    val nB = 64
    val bucketOf = (t: String) => java.lang.Math.floorMod(PolyHash56.hash(t), nB.toLong)
    // sparse model: only 'good' (+2.0) and 'bad' (-1.5) carry weight
    val weights = Seq((bucketOf("good"), 2000L), (bucketOf("bad"), -1500L))
      .toDF("bucket", "weight")
    val out = TextAnalysis.hashedLinearScore(corpus, weights, "text", "doc_id", nB)
    val m = out.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getDouble(2), r.getInt(3)))).toMap
    assert(m(1L) == ((2L, 2.0, 1)))
    assert(m(2L) == ((1L, -1.5, 0)))
    // the unmodeled token counts toward n but contributes weight 0
    assert(m(3L) == ((2L, 1.0, 1)))
    // the model must ride a broadcast — never a shuffled join
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("jaccardDecontaminate drops edited near-copies exact fingerprints miss") {
    import spark.implicits._
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),         // exact copy
      (2L, "the quick brown fox jumps over the lazy dog yesterday"),     // one-word edit
      (3L, "completely different text about spark shuffle partitions")) // clean
      .toDF("doc_id", "text")
    val fuzzy = TextAnalysis.jaccardDecontaminate(train, bench, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(fuzzy == Set(3L), "exact copy AND edited near-copy must drop")
    // exact decontamination keeps the edited copy — the gap fuzzy closes
    val exact = TextAnalysis.decontaminate(train, bench, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(exact == Set(2L, 3L))
    // the benchmark side must ride broadcasts — the corpus is never
    // shuffled by shingle
    val plan = TextAnalysis.jaccardDecontaminate(train, bench, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("contamination report quantifies partial benchmark leaks") {
    val bench = Seq((100L, "what is the capital of france paris obviously"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "what is the capital of france paris obviously"), // verbatim leak
      (2L, "quiz section what is the capital of france paris obviously end " +
        "plus a lot of original discussion around european geography topics"),
      (3L, "completely original text with no overlap at all whatsoever"))
      .toDF("doc_id", "text")
    val rep = TextAnalysis.contaminationReport(train, bench, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(rep(0).getDouble(3) == 1.0) // verbatim: every gram contaminated
    val partial = rep(1).getDouble(3)
    assert(partial > 0.2 && partial < 0.8, s"partial leak should score midway, got $partial")
    assert(rep(2).getDouble(3) == 0.0)
    // exact decontamination only removes the verbatim copy — the report is
    // what surfaces doc 2's leak
    val kept = TextAnalysis.decontaminate(train, bench, "text", "doc_id")
    assert(kept.count() == 2)
  }

  test("simhash: identical docs at hamming 0; near-dup pairs found via chunks") {
    val sig = Dedup.simhash(docs, "text", "doc_id")
    assert(sig.count() == docs.count())
    // doc joined to itself → hamming 0
    val self = sig.alias("a").join(sig.alias("b"), col("a.doc_id") === col("b.doc_id"))
      .select(Dedup.hamming(col("a.simhash"), col("b.simhash")).as("h"))
    assert(self.filter(col("h") =!= 0).isEmpty)
    val pairs = Dedup.simhashNearDupPairs(docs, "text", "doc_id", maxHamming = 8)
    assert(pairs.count() > 0) // near-dups by construction in the fixture
  }

  test("cosine similarity function matches a driver-side computation") {
    val rows = emb.limit(2).select("embedding").as[Array[Float]].collect()
    val (a, b) = (rows(0), rows(1))
    def dot(x: Array[Float], y: Array[Float]) =
      x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
    val expected = dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val got = emb.limit(2).agg(collect_list("embedding")).as[Seq[Array[Float]]].head()
    val viaCol = spark.sql("SELECT 1").select(
      VectorFunctions.cosineSimilarity(typedlit(a.toSeq), typedlit(b.toSeq)).as("c"))
      .as[Double].head()
    assert(math.abs(viaCol - expected) < 1e-9)
  }

  test("brute-force top-k: ranks ordered, self excluded, k respected") {
    val queries = emb.filter($"vec_id" < 3).select($"vec_id".as("q_id"), $"embedding")
    val topk = Similarity.bruteForceTopK(emb, queries, "vec_id", "q_id", "embedding", k = 5)
    val rows = topk.collect()
    assert(rows.length == 3 * 5)
    assert(!rows.exists(r => r.getAs[Long]("q_id") == r.getAs[Long]("vec_id")))
    // per query: cosine non-increasing with rank
    topk.groupBy("q_id").agg(collect_list(struct($"rank", $"cosine")).as("l"))
      .as[(Long, Seq[(Int, Double)])].collect().foreach { case (_, l) =>
        val sorted = l.sortBy(_._1).map(_._2)
        assert(sorted.zip(sorted.tail).forall { case (x, y) => x >= y })
      }
  }

  test("LSH top-k returns a subset of brute-force candidates with equal cosines") {
    val queries = emb.filter($"vec_id" < 5).select($"vec_id".as("q_id"), $"embedding")
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id", "q_id", "embedding",
        k = emb.count().toInt) // reference map over ALL pairs, not a top-k subset
      .select($"q_id", $"vec_id", round($"cosine", 9).as("c")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Similarity.lshTopK(emb, queries, "vec_id", "q_id", "embedding",
      k = 10, dim = 64, planes = 6)
      .select($"q_id", $"vec_id", round($"cosine", 9).as("c")).collect()
    assert(lsh.nonEmpty)
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(brute.contains(key) && math.abs(brute(key) - r.getDouble(2)) < 1e-9)
    }
  }

  test("multi-probe LSH beats single-probe recall at equal planes") {
    val queries = emb.filter($"vec_id" < 20).select($"vec_id".as("q_id"), $"embedding")
    val k = 10
    val truth = Similarity.bruteForceTopK(emb, queries, "vec_id", "q_id", "embedding", k)
      .select($"q_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(multiProbe: Boolean): Double = {
      val hits = Similarity.lshTopK(emb, queries, "vec_id", "q_id", "embedding",
        k, dim = 64, planes = 8, multiProbe = multiProbe)
        .select($"q_id", $"vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (hits intersect truth).size.toDouble / truth.size
    }
    val single = recallOf(false)
    val multi = recallOf(multiProbe = true)
    info(f"single-probe recall $single%.3f, multi-probe recall $multi%.3f")
    // the point of the probe fan-out: strictly more of the true top-k at
    // the SAME bucket granularity (fixed seed ⇒ deterministic margins)
    assert(multi > single,
      s"multi-probe recall $multi should beat single-probe $single")
    // multi-probe candidates are a superset, so cosines stay exact and
    // every returned pair is still a true-cosine ranked result
    assert(multi >= single + 0.05)
  }

  test("multi-probe near-dup pairs are a superset of single-probe, cosines exact") {
    // inject noisy near-dups: vec_id+5000 is vec_id with one dim nudged,
    // so true pairs sit at cosine ≈ 1 but can straddle one hyperplane
    val dups = emb.filter($"vec_id" < 200)
      .withColumn("vec_id", $"vec_id" + 5000L)
      .withColumn("embedding", expr(
        "transform(embedding, (x, j) -> IF(j = 0, float(x + 0.05), x))"))
    val corpus = emb.unionByName(dups)
    def pairsOf(mp: Boolean) = Similarity.cosineNearDupPairs(corpus, "vec_id",
      "embedding", threshold = 0.99, dim = 64, planes = 8, multiProbe = mp)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = pairsOf(false)
    val multi = pairsOf(mp = true)
    assert(single.subsetOf(multi)) // widened candidates, same exact verify
    assert(multi.size > single.size,
      s"multi-probe should recover margin-straddling pairs: ${multi.size} vs ${single.size}")
    // no pair double-counted by the probe fan-out
    val raw = Similarity.cosineNearDupPairs(corpus, "vec_id", "embedding",
      threshold = 0.99, dim = 64, planes = 8, multiProbe = true)
    assert(raw.count() == raw.distinct().count())
  }

  test("materialized IVF layout prunes partitions and matches the inline probe") {
    val centroids = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("centroid_id"), $"embedding")
    val queries = emb.filter($"vec_id" >= 90 && $"vec_id" < 93)
      .select($"vec_id".as("q_id"), $"embedding")
    val layout = java.nio.file.Files
      .createTempDirectory("ivf_layout_spec").resolve("by_cell").toString
    Similarity.writeIvfLayout(emb, centroids, "vec_id", "centroid_id",
      "embedding", layout)
    // the written layout is one directory per cell
    val cellDirs = new java.io.File(layout).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell=")).map(_.getName)
    assert(cellDirs.length > 1)
    val fromLayout = Similarity.ivfTopKFromLayout(spark, layout, queries,
      centroids, "vec_id", "q_id", "centroid_id", "embedding", k = 5, nprobe = 2)
    // the cell restriction must reach the scan as a PartitionFilter (files
    // outside the probed cells never open), not a post-scan Filter
    // sparkPlan, not executedPlan: AQE hides the scan until execution
    val scans = fromLayout.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val layoutScan = scans.find(_.relation.location.rootPaths.exists(
      _.toString.contains("by_cell"))).get
    assert(layoutScan.partitionFilters.exists(_.references.exists(_.name == "cell")))
    val probed = layoutScan.relation.location.listFiles(
      layoutScan.partitionFilters, Nil).length
    assert(probed < cellDirs.length) // strictly pruned: 3 queries × 2 probes
    // and the physical layout changes nothing about the answer
    val inline = Similarity.ivfTopK(emb, queries, centroids,
      "vec_id", "q_id", "centroid_id", "embedding", k = 5, nprobe = 2)
    assert(inline.exceptAll(fromLayout).isEmpty &&
      fromLayout.exceptAll(inline).isEmpty)
  }

  test("incremental IVF append: base files untouched, probe equals full rebuild") {
    val centroids = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("centroid_id"), $"embedding")
    val queries = emb.filter($"vec_id" >= 90 && $"vec_id" < 93)
      .select($"vec_id".as("q_id"), $"embedding")
    val layout = java.nio.file.Files
      .createTempDirectory("ivf_inc_spec").resolve("by_cell").toString
    Similarity.writeIvfLayout(emb.filter($"vec_id" < 50), centroids,
      "vec_id", "centroid_id", "embedding", layout)
    def files() = {
      val root = new java.io.File(layout)
      root.listFiles().filter(_.isDirectory).flatMap(_.listFiles())
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> f.lastModified()).toMap
    }
    val baseFiles = files()
    Similarity.appendToIvfLayout(emb.filter($"vec_id" >= 50), centroids,
      "vec_id", "centroid_id", "embedding", layout)
    // append-only: every base data file survives byte-identical (same
    // path, same mtime) — the append never rewrites existing partitions
    val after = files()
    assert(baseFiles.forall { case (p, m) => after.get(p).contains(m) },
      "append rewrote base files")
    assert(after.size > baseFiles.size, "append added no files")
    // and the incrementally-built store probes exactly like a full build
    val incremental = Similarity.ivfTopKFromLayout(spark, layout, queries,
      centroids, "vec_id", "q_id", "centroid_id", "embedding", k = 5, nprobe = 2)
    val full = Similarity.ivfTopK(emb, queries, centroids,
      "vec_id", "q_id", "centroid_id", "embedding", k = 5, nprobe = 2)
    assert(incremental.exceptAll(full).isEmpty && full.exceptAll(incremental).isEmpty)
  }

  test("IVF layout under file-count growth: per-partition compaction restores " +
    "file counts, probe stays byte-identical") {
    val centroids = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("centroid_id"), $"embedding")
    val queries = emb.filter($"vec_id" >= 90 && $"vec_id" < 93)
      .select($"vec_id".as("q_id"), $"embedding")
    val layout = java.nio.file.Files
      .createTempDirectory("ivf_compact_spec").resolve("by_cell").toString
    Similarity.writeIvfLayout(emb.filter($"vec_id" < 40), centroids,
      "vec_id", "centroid_id", "embedding", layout)
    // steady-state ingest: every append lands >= 1 new file per touched
    // cell, so file counts grow linearly with batches
    (40 until 100 by 10).foreach { lo =>
      Similarity.appendToIvfLayout(
        emb.filter($"vec_id" >= lo && $"vec_id" < lo + 10), centroids,
        "vec_id", "centroid_id", "embedding", layout)
    }
    def dataFiles() = new java.io.File(layout).listFiles()
      .filter(_.isDirectory).flatMap(_.listFiles())
      .filter(_.getName.endsWith(".parquet"))
    val before = Similarity.ivfTopKFromLayout(spark, layout, queries,
      centroids, "vec_id", "q_id", "centroid_id", "embedding",
      k = 5, nprobe = 2).collect().toSet
    val fragmented = dataFiles().length
    val (bins, removed, added) =
      graft.sinks.Compaction.compactPartitioned(spark, layout,
        targetBytes = 64L * 1024 * 1024)
    assert(bins > 0 && removed > added, s"no merge happened ($bins, $removed, $added)")
    val compacted = dataFiles().length
    assert(compacted < fragmented,
      s"compaction did not shrink file count ($fragmented -> $compacted)")
    // bins never cross partition values: pruning still works and the
    // probe answer is byte-identical to the fragmented store
    val after = Similarity.ivfTopKFromLayout(spark, layout, queries,
      centroids, "vec_id", "q_id", "centroid_id", "embedding",
      k = 5, nprobe = 2).collect().toSet
    assert(after == before)
  }

  test("PQ: codes well-formed, ADC ranking finds same-label neighbors") {
    val cb = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("code"), col("embedding"))
    val enc = Similarity.pqEncode(emb, cb, "vec_id", "code", "embedding",
      subspaces = 8, subDim = 8)
    assert(enc.count() == emb.count())
    val codes = enc.select(explode(col("codes")).as("c"))
    assert(codes.filter(col("c") < 0 || col("c") >= 16).count() == 0)
    assert(enc.select(size(col("codes"))).distinct().head().getInt(0) == 8)

    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val top = Similarity.pqTopK(emb, queries, cb, "vec_id", "q_id", "code",
      "embedding", subspaces = 8, subDim = 8, k = 5)
    assert(top.groupBy("q_id").count().filter(col("count") =!= 5).count() == 0)
    // ADC approximates EXACT L2 (labels are cosine ground truth, not L2's
    // — exact-L2 top-5 itself only hits 28% label agreement on this
    // fixture, so that's the wrong yardstick): at least half of the ADC
    // top-5 must sit inside the exact-L2 top-20 (measured 0.6 with this
    // untrained 16-code book)
    val wL2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("__d").asc, col("vec_id").asc)
    val exact20 = emb.select(col("vec_id"), col("embedding").as("__cv"))
      .crossJoin(queries.withColumnRenamed("embedding", "__qv"))
      .withColumn("__d", graft.functions.VectorFunctions
        .euclideanDistance(col("__cv"), col("__qv")))
      .withColumn("__rk", row_number().over(wL2))
      .filter(col("__rk") <= 20)
      .select(col("q_id"), col("vec_id"))
    val inExact = top.join(exact20, Seq("q_id", "vec_id"), "left_semi").count().toDouble
    val total = top.count().toDouble
    assert(inExact / total >= 0.4, s"ADC∩exactL2@20 recall $inExact/$total")
  }

  test("IVF-PQ layout: no float column on disk, partition-pruned probe, inline-equal") {
    val centroids = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("centroid_id"), $"embedding")
    val cb = emb.filter($"vec_id" < 16)
      .select($"vec_id".as("code"), $"embedding")
    val queries = emb.filter($"vec_id" >= 90 && $"vec_id" < 93)
      .select($"vec_id".as("q_id"), $"embedding")
    val layout = java.nio.file.Files
      .createTempDirectory("ivfpq_layout_spec").resolve("codes_by_cell").toString
    Similarity.writeIvfPqLayout(emb, centroids, cb, "vec_id", "centroid_id",
      "code", "embedding", subspaces = 8, subDim = 8, layout)
    // the layout is cell directories of (vec_id, codes) — the 256-byte
    // float vector never reaches disk
    val cellDirs = new java.io.File(layout).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell=")).map(_.getName)
    assert(cellDirs.length > 1)
    assert(spark.read.parquet(layout).schema.fieldNames.toSet ==
      Set("vec_id", "codes", "cell"))
    val fromLayout = Similarity.ivfPqTopKFromLayout(spark, layout, queries,
      centroids, cb, "vec_id", "q_id", "centroid_id", "code", "embedding",
      subspaces = 8, subDim = 8, k = 5, nprobe = 2)
    // probe plan: cell restriction reaches the scan as a PartitionFilter
    // (non-probed directories never open) AND the scan schema carries only
    // id + codes — queries rank a 100 TB corpus without reading one float
    val scans = fromLayout.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val layoutScan = scans.find(_.relation.location.rootPaths.exists(
      _.toString.contains("codes_by_cell"))).get
    // the static IN-list is what we pushed; Spark may ADD a dynamic-pruning
    // subquery on top (runtime re-prune off the broadcast probe table —
    // welcome at scale, but not evaluable in a manual listFiles call)
    val staticFilters = layoutScan.partitionFilters.filterNot(_.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning]))
    assert(staticFilters.exists(_.references.exists(_.name == "cell")))
    val probed = layoutScan.relation.location.listFiles(staticFilters, Nil).length
    assert(probed < cellDirs.length) // strictly pruned: 3 queries × 2 probes
    assert(layoutScan.requiredSchema.fieldNames.toSet == Set("vec_id", "codes"))
    // and the layout path is bit-equal to the inline twin
    val inline = Similarity.ivfPqTopK(emb, queries, centroids, cb,
      "vec_id", "q_id", "centroid_id", "code", "embedding",
      subspaces = 8, subDim = 8, k = 5, nprobe = 2)
    assert(inline.exceptAll(fromLayout).isEmpty &&
      fromLayout.exceptAll(inline).isEmpty)
  }

  test("text profile: counts and ratios are consistent") {
    val p = TextAnalysis.profile(docs, "text").cache()
    assert(p.count() == docs.count())
    assert(p.filter($"n_tokens" <= 0).isEmpty)
    assert(p.filter($"n_chars_m" =!= $"n_chars").isEmpty) // fixture carries n_chars
    assert(p.filter($"stopword_ratio" < 0 || $"stopword_ratio" > 1).isEmpty)
    assert(p.filter($"quality" < 0 || $"quality" > 1).isEmpty)
    // fingerprint: equal texts ⇔ equal fingerprints (on this corpus)
    val byText = docs.groupBy("text").agg(countDistinct("doc_id").as("n")).count()
    val byFp = p.select("fp").distinct().count()
    assert(byFp == byText)
  }

  test("fused n-gram hash is bit-identical to hashing the gram strings") {
    import graft.functions.PolyHash56
    val viaStrings = Dedup.shingles(docs, "text", "doc_id", 3)
      .select(col("doc_id"), PolyHash56(col("shingle")).as("__sh"))
    val fused = Dedup.shingleHashes(docs, "text", "doc_id", 3)
    assert(viaStrings.exceptAll(fused).isEmpty && fused.exceptAll(viaStrings).isEmpty)
    // short-doc branch: fewer tokens than n collapses to one whole-doc gram
    import spark.implicits._
    val shorty = Seq((1L, "only two")).toDF("doc_id", "text")
    val f = Dedup.shingleHashes(shorty, "text", "doc_id", 3).select("__sh").as[Long].head()
    assert(f == PolyHash56.hash("only two"))
  }

  test("repeatedPassages matches a brute-force reference on random corpora") {
    // tiny vocabulary ⇒ dense organic repeats ⇒ the islands merge sees
    // single-window hits, adjacent-run merges, and multi-extent docs far
    // beyond what the curated fixtures produce
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d", "e")
    val L = 3
    (0 until 3).foreach { trial =>
      val corpus = (0 until 30).map(i => (i.toLong,
        (0 until (L + rnd.nextInt(30))).map(_ => vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")))
      val wins = corpus.flatMap { case (id, text) =>
        val t = text.trim.split("\\s+")
        if (t.length >= L)
          (0 to t.length - L).map(o => (t.slice(o, o + L).mkString(" "), id, o))
        else Nil
      }
      val repeated = wins.groupBy(_._1)
        .filter { case (_, occ) => occ.map(_._2).distinct.size >= 2 }
        .values.flatten
      val expected = repeated.groupBy(_._2).flatMap { case (id, occ) =>
        val offs = occ.map(_._3).toSeq.distinct.sorted
        val runs = offs.foldLeft(List.empty[List[Int]]) {
          case (run :: rest, o) if run.head == o - 1 => (o :: run) :: rest
          case (acc, o) => List(o) :: acc
        }
        runs.map(g => (id, g.min, g.max + L, g.max + L - g.min, g.size.toLong))
      }.toSet
      val actual = Dedup.repeatedPassages(corpus.toDF("doc_id", "text"),
        "text", "doc_id", windowTokens = L).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
          r.getLong(4))).toSet
      assert(actual == expected, s"trial $trial diverged from brute force")
    }
  }

  test("passage decontamination localizes benchmark leaks to spans") {
    // 11-token benchmark doc quoted verbatim inside a training doc after a
    // 5-token prefix: the leak must surface as ONE extent of exactly the
    // quote — [5, 16) — not as a dropped document
    val quote = "what is the capital of france the answer is paris obviously"
    val bench = Seq((100L, quote)).toDF("doc_id", "text")
    val train = Seq(
      (1L, s"some training text here today $quote and more"),
      (2L, "completely unrelated training document with nothing quoted at all here"))
      .toDF("doc_id", "text")
    val ext = TextAnalysis.passageDecontaminate(train, bench, "text", "doc_id",
      windowTokens = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getLong(4))).toSet
    assert(ext == Set((1L, 5, 16, 11, 4L)))
    // window longer than every benchmark doc ⇒ no bench windows ⇒ no leaks
    assert(TextAnalysis.passageDecontaminate(train, bench, "text", "doc_id",
      windowTokens = 13).isEmpty)
    // whole-doc decontamination (x23 semantics) would KEEP doc 1 entirely —
    // its full-text fingerprint differs from the benchmark's — which is
    // exactly the leak class this operator exists to catch
    assert(TextAnalysis.decontaminate(train, bench, "text", "doc_id").count() == 2)
  }

  test("semantic near-dup via cells: full-semantics determinism, capped, auditable") {
    val centroids = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("centroid_id"), $"embedding")
    val dupes = emb.filter(pmod($"vec_id", lit(7)) === 0)
      .withColumn("vec_id", $"vec_id" + 100000L)
    val corpus = emb.unionByName(dupes)
    val pairs = Similarity.semanticNearDupPairs(corpus, centroids,
      "vec_id", "centroid_id", "embedding", threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical vectors assign to the identical cell (deterministic
    // distances, centroid-id tie-break), so recall on exact dups is 1 and
    // nothing organic reaches 0.99 on this fixture
    val expected = emb.filter(pmod($"vec_id", lit(7)) === 0)
      .select($"vec_id").as[Long].collect()
      .map(id => (id, id + 100000L)).toSet
    assert(pairs == expected)
    // mass-duplicate cell: 40 copies of one constant vector concentrate in
    // ONE cell; the cap drops that cell wholesale and the audit reports it
    val flood = (1000L to 1039L).map(i => (i, Array.fill(64)(0.5f)))
      .toDF("vec_id", "embedding")
    val flooded = corpus.select($"vec_id", $"embedding").unionByName(flood)
    val capped = Similarity.semanticNearDupPairs(flooded, centroids,
      "vec_id", "centroid_id", "embedding", threshold = 0.99, maxCell = 80)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.forall { case (a, b) => a < 1000L && (b < 1000L || b >= 100000L) },
      "the flood cell is dropped wholesale")
    assert(capped.nonEmpty && capped.subsetOf(expected))
    val over = Similarity.oversizedCells(flooded, centroids,
      "vec_id", "centroid_id", "embedding", maxCell = 80).collect()
    assert(over.length >= 1 && over.exists(_.getLong(1) >= 40L))
    // boundary recall: probing each vector's 2 nearest cells widens the
    // candidate set (superset law), verification stays exact, and matches
    // through several shared cells collapse to one row
    val multi = Similarity.semanticNearDupPairs(corpus, centroids,
      "vec_id", "centroid_id", "embedding", threshold = 0.2, nprobe = 2)
    val single = Similarity.semanticNearDupPairs(corpus, centroids,
      "vec_id", "centroid_id", "embedding", threshold = 0.2)
    val mset = multi.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sset = single.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sset.subsetOf(mset))
    assert(mset.size > sset.size,
      s"nprobe=2 should recover boundary pairs: ${mset.size} vs ${sset.size}")
    assert(multi.count() == multi.distinct().count(), "no pair double-counted")
  }

  test("maskSpans cuts extents; decontaminate-then-mask leaves no leaks") {
    val quote = "name every planet of the solar system in order from the sun"
    val bench = Seq((100L, quote)).toDF("doc_id", "text")
    val train = Seq(
      (1L, s"intro words here $quote closing words"),
      (2L, "untouched   doc   with   odd    spacing"),
      (3L, quote)).toDF("doc_id", "text")
    val ext = TextAnalysis.passageDecontaminate(train, bench, "text", "doc_id",
      windowTokens = 8)
    val maskedDf = TextAnalysis.maskSpans(train, ext, "text", "doc_id")
    val masked = maskedDf.select("doc_id", "masked").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(masked(1L) == "intro words here closing words")
    // no extents ⇒ byte-identical pass-through, odd whitespace preserved
    assert(masked(2L) == "untouched   doc   with   odd    spacing")
    assert(masked(3L) == "") // fully-leaked doc masks to empty
    // closure: after surgery, a second decontamination pass finds nothing
    val again = TextAnalysis.passageDecontaminate(
      maskedDf.select(col("doc_id"), col("masked").as("text")),
      bench, "text", "doc_id", windowTokens = 8)
    assert(again.isEmpty)
  }

  test("bloom decontamination equals exact decontamination") {
    val bench = docs.filter(col("doc_id") % 13 === 0)
    val exact = TextAnalysis.decontaminate(docs, bench, "text", "doc_id")
      .select("doc_id")
    val bloom = TextAnalysis.bloomDecontaminate(docs, bench, "text", "doc_id",
      expectedItems = 1000L).select("doc_id")
    assert(exact.exceptAll(bloom).isEmpty && bloom.exceptAll(exact).isEmpty)
    // the probe is Spark's native codegen'd might_contain over a
    // bloom_filter_agg scalar subquery — no ScalaUDF boundary in the plan
    val planStr = bloom.queryExecution.executedPlan.toString
    assert(!planStr.contains("ScalaUDF"),
      s"bloom probe must not cross a UDF boundary:\n$planStr")
    assert(bloom.queryExecution.optimizedPlan.toString.contains("might_contain"),
      "expected the native BloomFilterMightContain probe in the plan")
    // and with a deliberately tiny/over-saturated filter (high fpp): still
    // exact, only the prefilter selectivity degrades
    val saturated = TextAnalysis.bloomDecontaminate(docs, bench, "text", "doc_id",
      expectedItems = 10L, fpp = 0.5).select("doc_id")
    assert(exact.exceptAll(saturated).isEmpty && saturated.exceptAll(exact).isEmpty)
  }

  test("perceptual-hash near-dup finds re-encoded media byte-dedup misses") {
    // same "image" content with a trailing re-encode artifact: distinct
    // BYTES (exact dedup keeps both) but near-identical byte-statistics
    // features ⇒ small pHash hamming; doc 3 is unrelated content
    val media = Multimodal.synthesizeFromText(Seq(
      (1L, "a completely ordinary picture of a cat sitting on a mat today"),
      (2L, "a completely ordinary picture of a cat sitting on a mat today."),
      (3L, "QQQQQQQQ XXXXXXXX QQQQQQQQ XXXXXXXX QQQQQQQQ XXXXXXXX ZZZZZZZZ"))
      .toDF("doc_id", "text"), "doc_id", "text")
    assert(Dedup.exactByContent(media, "payload", "media_id").count() == 3)
    val feats = Multimodal.extractFeatures(spark, media).toDF()
    val pairs = Multimodal.phashNearDupPairs(feats, "media_id", "features",
      maxHamming = 2).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    // pHash is deterministic and bounded to 16 bits
    val phs = feats.select(Multimodal.perceptualHash(col("features"))).collect()
      .map(_.getLong(0))
    assert(phs.forall(p => p >= 0 && p < (1 << 16)))
    // wider feature vectors (production featurizers) hash only the first 16
    // dims — the fold stays exact and never saturates the long cast
    val wide = Seq((1L, (0 until 512).map(i => i.toFloat).toArray))
      .toDF("media_id", "features")
    val first16 = Seq((1L, (0 until 16).map(i => i.toFloat).toArray))
      .toDF("media_id", "features")
    val wphs = wide.select(Multimodal.perceptualHash(col("features"))).as[Long].head()
    assert(wphs == first16.select(Multimodal.perceptualHash(col("features"))).as[Long].head())
    assert(wphs >= 0 && wphs < (1 << 16))
  }

  test("video near-dup: re-encoded copies recovered from aligned frame content") {
    // ids ≡ 2 (mod 3) synthesize as videos; 74 → duration 10138 ms, so a
    // 10000 ms grid samples TWO frames; the +300000 shift preserves kind
    // and duration, so the re-encoded copy (one appended byte — distinct
    // payload) lives on the same frame grid
    val vids = Seq(
      (74L, "a perfectly ordinary home video of a dog catching a ball outside"),
      (300074L, "a perfectly ordinary home video of a dog catching a ball outside."),
      (77L, "completely different footage entirely unrelated to anything else here"),
      (80L, "QQQQQQQQ XXXXXXXX QQQQQQQQ XXXXXXXX QQQQQQQQ XXXXXXXX ZZZZZZZZ wild"))
      .toDF("doc_id", "text")
    val media = Multimodal.synthesizeFromText(vids, "doc_id", "text")
    assert(media.filter(col("meta.kind") === "video").count() == 4)
    assert(Dedup.exactByContent(media, "payload", "media_id").count() == 4)
    val pairs = Multimodal.videoNearDupPairs(spark, media, everyMs = 10000,
      maxHamming = 2, minMatchFrac = 0.5).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((74L, 300074L)))
    assert(pairs.head.getDouble(3) == 1.0) // every aligned frame matches
    // mass-duplicate frame bucket (the black-intro/station-ident case): 30
    // videos with IDENTICAL payload and duration (ids 60000 apart keep
    // kind AND duration) put 30 rows in one (frame, chunk, value) bucket
    val flood = (0 until 30).map(i =>
      (2L + 60000L * i, "station ident card identical on every channel tonight ok"))
      .toDF("doc_id", "text")
    val flooded = Multimodal.synthesizeFromText(vids.unionByName(flood), "doc_id", "text")
    val uncapped = Multimodal.videoNearDupPairs(spark, flooded, everyMs = 10000,
      maxHamming = 2, minMatchFrac = 0.5)
    assert(uncapped.count() == 30L * 29 / 2 + 1) // flood clique + the copy pair
    val capped = Multimodal.videoNearDupPairs(spark, flooded, everyMs = 10000,
      maxHamming = 2, minMatchFrac = 0.5, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.contains((74L, 300074L)), "pair outside hot buckets survives")
    assert(capped.forall { case (a, b) => a == 74L && b == 300074L },
      "the 30-copy frame bucket is dropped wholesale")
    val over = Multimodal.oversizedFrameBuckets(spark, flooded,
      everyMs = 10000, maxHamming = 2, maxBucket = 10).collect()
    assert(over.nonEmpty && over.forall(_.getLong(3) >= 30L))
  }

  test("multimodal: features deterministic, metadata filter prunes payload") {
    val media = Multimodal.synthesizeFromText(docs, "doc_id", "text").cache()
    val f1 = Multimodal.extractFeatures(spark, media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(spark, media).collect().sortBy(_.media_id)
    assert(f1.length == docs.count())
    assert(f1.zip(f2).forall { case (a, b) =>
      a.checksum == b.checksum && a.features.sameElements(b.features) })
    assert(f1.forall(_.features.length == 16))
    val imgs = Multimodal.filterByMeta(media, "image", minWidth = 100)
    assert(imgs.columns.toSet == Set("media_id", "meta"))
    assert(imgs.count() > 0)
    val frames = Multimodal.sampleFrames(media, everyMs = 10000)
    assert(frames.count() >= media.filter(col("meta.kind") === "video").count())
  }

  test("ngramRepetitionStats: top repeated bigram share + duplicated 5-gram coverage") {
    val df = Seq(
      (1L, "a b a b a b"),                 // "a b" ×3 of 5 bigrams; no repeated 5-gram
      (2L, "x y z w v x y z w v"),         // "x y z w v" ×2 covers all 10 positions
      (3L, "one two three four five six seven") // nothing repeats at any n
    ).toDF("doc_id", "text")
    val out = TextAnalysis.ngramRepetitionStats(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 1: 6 single-char tokens → n_chars 6; top bigram chars 3×2=6 → 1.0
    assert(out(1L).getAs[Long]("n_chars") == 6L)
    assert(out(1L).getAs[Double]("top_share") == 1.0)
    assert(out(1L).getAs[Double]("dup_frac") == 0.0)
    assert(!out(1L).getAs[Boolean]("keep"))
    // doc 2: every position sits under an occurrence of the repeated 5-gram
    assert(out(2L).getAs[Double]("dup_frac") == 1.0)
    assert(!out(2L).getAs[Boolean]("keep"))
    // doc 3: no gram occurs twice → both metrics 0, kept
    assert(out(3L).getAs[Double]("top_share") == 0.0)
    assert(out(3L).getAs[Double]("dup_frac") == 0.0)
    assert(out(3L).getAs[Boolean]("keep"))
  }

  test("bigramLogProb: add-one transition NLL against hand computation") {
    val df = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProb(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    // corpus: c(a,b)=3, c(b,a)=1; ctx(a)=3, ctx(b)=1; V=2
    val nllAB = -math.log(4.0 / 5.0) // (3+1)/(3+2)
    val nllBA = -math.log(2.0 / 3.0) // (1+1)/(1+2)
    assert(out(1L).getAs[Long]("n_bigrams") == 3L)
    assert(math.abs(out(1L).getAs[Double]("mean_nll") - (2 * nllAB + nllBA) / 3) < 1e-6)
    assert(out(2L).getAs[Long]("n_bigrams") == 1L)
    assert(math.abs(out(2L).getAs[Double]("mean_nll") - nllAB) < 1e-6)
  }

  test("leakageSafeSplit: cluster members share a split; singletons match per-doc split") {
    val ids = (0L until 300L)
    val docsDf = ids.map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val clusters = Seq((3L, 3L), (10L, 3L), (77L, 3L), (120L, 120L), (150L, 120L))
      .toDF("id", "comp")
    val out = graft.x.Sampling.leakageSafeSplit(docsDf, "doc_id", clusters,
      testFraction = 0.3, validationFraction = 0.3).cache()
    // no split_key straddles splits (the audit the column exists for)
    val straddle = out.groupBy("split_key")
      .agg(countDistinct(col("split")).as("ns")).filter(col("ns") > 1).count()
    assert(straddle == 0L)
    // the named cluster lands together
    assert(out.filter(col("doc_id").isin(3L, 10L, 77L))
      .select("split").distinct().count() == 1L)
    // docs in no cluster get exactly the per-doc assignment (same salt)
    val solo = graft.x.Sampling.trainTestSplit(docsDf, "doc_id", 0.3, 0.3)
      .select(col("doc_id"), col("split").as("solo_split"))
    val clustered = Seq(3L, 10L, 77L, 120L, 150L)
    val diff = out.join(solo, "doc_id")
      .filter(!col("doc_id").isin(clustered: _*))
      .filter(col("split") =!= col("solo_split")).count()
    assert(diff == 0L)
    out.unpersist()
  }

  test("ngramRepetitionStats equals a driver-side brute force on random corpora") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "bb", "ccc", "d", "ee")
    val docsSeq = (1L to 60L).map { id =>
      val len = 1 + rnd.nextInt(30)
      id -> (1 to len).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val got = TextAnalysis.ngramRepetitionStats(
        docsSeq.toDF("doc_id", "text"), "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    docsSeq.foreach { case (id, text) =>
      val toks = text.split("\\s+").toVector
      val nChars = toks.map(_.length).sum.toLong
      def grams(n: Int): Vector[(Int, String)] =
        if (toks.size >= n)
          (0 to toks.size - n).map(i => i -> toks.slice(i, i + n).mkString(" ")).toVector
        else Vector(0 -> toks.mkString(" "))
      val c2 = grams(2).groupBy(_._2).view.mapValues(_.size).toMap.filter(_._2 >= 2)
      val top = if (c2.isEmpty) 0L
        // .toSeq first: mapping a Map would key tuples by count and silently
        // drop tied entries
        else c2.toSeq.map { case (g, c) => (c.toLong, c.toLong * g.count(_ != ' ')) }.max._2
      val g5 = grams(5)
      val cnt5 = g5.groupBy(_._2).view.mapValues(_.size).toMap
      val span5 = math.min(5, toks.size)
      val covered = g5.filter(o => cnt5(o._2) > 1)
        .flatMap { case (st, _) => st until (st + span5) }.toSet
      val dup = covered.toSeq.map(p => toks(p).length).sum.toLong
      val (gn, gt, gd) = got(id)
      assert(gn == nChars, s"doc $id n_chars")
      assert(math.abs(gt - top.toDouble / nChars) < 1e-12, s"doc $id top_share")
      assert(math.abs(gd - dup.toDouble / nChars) < 1e-12, s"doc $id dup_frac")
    }
  }

  test("incrementalNearDup first batch equals the candidate-pair reference") {
    // the bucket-minimum rule is definitionally: drop d iff some candidate
    // pair (d', d) with d' < d exists — i.e. lshCandidatePairs' id_b side
    val rnd = new scala.util.Random(11)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val texts = collection.mutable.ArrayBuffer[String]()
    val docsSeq = (0L until 40L).map { id =>
      val text =
        if (id % 3 == 2 && texts.nonEmpty) texts(rnd.nextInt(texts.length)) // copy class
        else (1 to 12 + rnd.nextInt(8)).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      texts += text
      id -> text
    }
    val df = docsSeq.toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(
      Dedup.shingleHashes(df, "text", "doc_id", 3), "doc_id", 32)
    val blockedRef = Dedup.lshCandidatePairs(sigs, "doc_id", 32, 8,
        maxBucket = Int.MaxValue)
      .select("id_b").as[Long].collect().toSet
    val store = java.nio.file.Files
      .createTempDirectory("band_store_prop").resolve("bands").toString
    val admitted = Dedup.incrementalNearDup(df, "text", "doc_id", store)
      .select("doc_id").as[Long].collect().toSet
    assert(admitted == docsSeq.map(_._1).toSet -- blockedRef)
  }

  test("hardNegatives excludes positives before ranking, not after") {
    // corpus of 4: item 10 is (near-)identical to the query → would be
    // top-1; as a labeled positive it must vanish AND free its slot
    val mk = (s: Float) => Array.tabulate(4)(i => if (i == 0) s else 0.1f * i)
    val corpus = Seq((10L, mk(1.0f)), (11L, mk(0.9f)), (12L, mk(0.8f)), (13L, mk(0.7f)))
      .toDF("vec_id", "embedding")
    val queries = Seq((1L, mk(1.0f))).toDF("q_id", "embedding")
    val positives = Seq((1L, 10L)).toDF("q_id", "vec_id")
    val out = Similarity.hardNegatives(corpus, queries, positives,
      "vec_id", "q_id", "embedding", k = 2)
      .select("vec_id", "rank").as[(Long, Int)].collect().sortBy(_._2)
    assert(out.map(_._1).toSeq == Seq(11L, 12L)) // 10 excluded, 11 takes rank 1
    assert(out.map(_._2).toSeq == Seq(1, 2))
    // sanity: without labels the positive wins rank 1
    val top = Similarity.bruteForceTopK(corpus, queries, "vec_id", "q_id", "embedding", 1)
      .select("vec_id").as[Long].head()
    assert(top == 10L)
  }

  test("piiExtents coordinates feed maskSpans like any other extent source") {
    val df = Seq(
      (1L, "hello reach me at bob@corp.io or https://x.io/a then call +12345678901 bye"),
      (2L, "nothing sensitive in here at all")
    ).toDF("doc_id", "text")
    val ext = TextAnalysis.piiExtents(df, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(3))).toSet
    // token positions (0-based): bob@corp.io at 4, url at 6, phone at 9
    assert(ext == Set((1L, 4, "email"), (1L, 6, "url"), (1L, 9, "phone")))
    val masked = TextAnalysis.maskSpans(df,
        TextAnalysis.piiExtents(df, "text", "doc_id"), "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("masked")).toMap
    assert(masked(1L) == "hello reach me at or then call bye")
    assert(masked(2L) == "nothing sensitive in here at all") // untouched, byte-identical
    // after surgery a second scan finds nothing (closure)
    assert(TextAnalysis.piiExtents(
      TextAnalysis.maskSpans(df, TextAnalysis.piiExtents(df, "text", "doc_id"),
        "text", "doc_id").select(col("doc_id"), col("masked").as("text")),
      "text", "doc_id").count() == 0)
  }

  test("temperatureRebalance flattens the mix via isqrt weights") {
    val df = (1L to 900L).map(i =>
      (i, if (i <= 800) "en" else if (i <= 880) "fr" else "zh"))
      .toDF("doc_id", "lang")
    val out = graft.x.Sampling.temperatureRebalance(df, "doc_id", "lang",
      Seq("en", "fr", "zh")).cache()
    // definitionally equal to mixtureRebalance with explicit isqrt weights
    // (en 800→28, fr 80→8, zh 20→4)
    val manual = graft.x.Sampling.mixtureRebalance(df, "doc_id", "lang",
      Map("en" -> 28L, "fr" -> 8L, "zh" -> 4L))
    assert(out.select("doc_id").except(manual.select("doc_id")).count() == 0)
    assert(manual.select("doc_id").except(out.select("doc_id")).count() == 0)
    // the dominant stratum's share shrinks, the tail's grows
    val n = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totalOut = n.values.sum.toDouble
    assert(n("en") / totalOut < 800.0 / 900.0)
    assert(n("zh") / totalOut > 20.0 / 900.0)
    out.unpersist()
  }

  test("curate: composed pipeline gates junk, collapses exact+near dups, splits") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"), // exact dup of 1
      (3L, "alpha beta gamma delta epsilon zeta eta iota"),  // jaccard 5/7 ≈ .71 vs 1
      (4L, "spam spam spam spam spam spam"),                 // uniq_ratio 1/6 → gated
      (5L, "one two three four five six seven eight nine"),
      (6L, "tiny doc")                                       // < 5 tokens → gated
    ).toDF("doc_id", "text")
    val out = graft.x.Curation.curate(df, "text", "doc_id").cache()
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 5L))
    // survivors carry a split and contain no remaining near-dup pair
    assert(out.filter(!col("split").isin("train", "validation", "test")).count() == 0)
    assert(graft.x.Dedup.ngramJaccardPairs(
      out.select("doc_id", "text"), "text", "doc_id", n = 3, threshold = 0.5).count() == 0)
    out.unpersist()
  }

  test("resolveEntities links typo variants within blocks, keeps min-id canonicals") {
    import spark.implicits._
    val rows = Seq(
      (1L, "Acme Corporation", "us"),
      (2L, "Acme Corporation", "us"),   // exact dup
      (3L, "Acme Corporatoin", "us"),   // transposition, dist 2
      (4L, "Acme Corporation", "eu"),   // same name, DIFFERENT block — not linked
      (5L, "Zenith Industries", "us"),
      (6L, "Zenith Industrial", "us"))  // dist 2 tail edit
      .toDF("id", "name", "region")
      .withColumn("blk", concat(col("region"), substring(col("name"), 1, 3)))
    val out = Dedup.resolveEntities(rows, "id", "name", "blk", maxDist = 2)
      .collect().map(r => r.getAs[Long]("entity_id") ->
        ((r.getAs[String]("name"), r.getAs[Long]("n_members")))).toMap
    assert(out.keySet == Set(1L, 4L, 5L), "three entities: us-Acme, eu-Acme, us-Zenith")
    assert(out(1L) == (("Acme Corporation", 3L)), "min-id canonical, members 1,2,3")
    assert(out(4L) == (("Acme Corporation", 1L)), "blocking isolates regions")
    assert(out(5L) == (("Zenith Industries", 2L)))
  }

  test("curationLineage labels every doc with its disposition and representative") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"), // exact dup of 1
      (3L, "alpha beta gamma delta epsilon zeta eta iota"),  // near-dup of 1
      (4L, "spam spam spam spam spam spam"),                 // gated
      (5L, "one two three four five six seven eight nine"),
      (6L, "tiny doc")                                       // gated
    ).toDF("doc_id", "text")
    val lin = graft.x.Curation.curationLineage(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    assert(lin.size == 6, "one lineage row per input doc, always")
    assert(lin(2L) == (("dropped_exact_dup", 1L)))
    assert(lin(3L) == (("dropped_near_dup", 1L)))
    assert(lin(4L)._1 == "dropped_quality" && lin(4L)._2 == -1L)
    assert(lin(6L)._1 == "dropped_quality")
    assert(lin(1L)._1.startsWith("kept_") && lin(1L)._2 == -1L)
    assert(lin(5L)._1.startsWith("kept_"))
    // the kept set and its splits agree with curate() exactly
    val kept = graft.x.Curation.curate(df, "text", "doc_id")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> s"kept_${r.getString(1)}").toMap
    assert(lin.filter(_._2._1.startsWith("kept_")).view.mapValues(_._1).toMap == kept)
  }

  test("incrementalNearDup: store blocks cross-batch copies, bucket-min keeps one per class") {
    val store = java.nio.file.Files
      .createTempDirectory("band_store_spec").resolve("bands").toString
    val b1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (5L, "completely unrelated text about catalyst optimizer rule injection")
    ).toDF("doc_id", "text")
    val a1 = Dedup.incrementalNearDup(b1, "text", "doc_id", store)
      .select("doc_id").as[Long].collect().sorted
    assert(a1 sameElements Array(1L, 5L)) // 2 is a copy of 1 → bucket-min keeps 1
    val b2 = Seq(
      (9L, "the quick brown fox jumps over the lazy dog again and again today"),
      (11L, "a fresh document resembling nothing the store has ever admitted")
    ).toDF("doc_id", "text")
    val a2 = Dedup.incrementalNearDup(b2, "text", "doc_id", store)
      .select("doc_id").as[Long].collect().sorted
    assert(a2 sameElements Array(11L)) // 9 collides with retained doc 1's buckets
    // after the commit, a full replay of batch 2 admits nothing new
    val a3 = Dedup.incrementalNearDup(b2, "text", "doc_id", store).count()
    assert(a3 == 0L)
    // two-phase ordering (same contract as incrementalExact): a crash in
    // persistAdmitted leaves the band store untouched → replay re-admits
    val store2 = java.nio.file.Files
      .createTempDirectory("band_store_2pc").resolve("bands").toString
    val batch = Seq((1L, "a perfectly unique document seen exactly once ever"))
      .toDF("doc_id", "text")
    intercept[RuntimeException] {
      Dedup.incrementalNearDup(batch, "text", "doc_id", store2,
        persistAdmitted = _ => throw new RuntimeException("crash mid-write"))
    }
    assert(graft.sources.VersionedParquet.versions(store2).isEmpty,
      "band buckets must not commit before the admitted output is durable")
    var persisted = 0L
    val replay = Dedup.incrementalNearDup(batch, "text", "doc_id", store2,
      persistAdmitted = df => persisted = df.count())
    assert(replay.count() == 1 && persisted == 1L, "replay re-admits the batch")
  }

  test("jlProject: constant deterministic signs, structure-preserving projection") {
    import spark.implicits._
    val signs = Similarity.jlSigns(64, 16)
    // pure function of (i, j, seed): rebuild equals, different seed differs
    assert(Similarity.jlSigns(64, 16).map(_.toSeq).toSeq == signs.map(_.toSeq).toSeq)
    assert(Similarity.jlSigns(64, 16, seed = 7L).map(_.toSeq).toSeq !=
      signs.map(_.toSeq).toSeq)
    // signs are balanced enough to be a real mixing matrix
    val total = signs.map(_.sum).sum
    assert(math.abs(total) < 64 * 16 / 4.0, s"sign matrix too lopsided: $total")
    // two tight clusters stay separated after 64 -> 16 projection
    val rnd = new scala.util.Random(5)
    def near(center: Array[Float]) =
      center.map(c => c + (rnd.nextFloat() - 0.5f) * 0.1f)
    val c1 = Array.fill(64)(rnd.nextFloat() * 2 - 1)
    val c2 = Array.fill(64)(rnd.nextFloat() * 2 - 1)
    val vecs = (0 until 10).map(i => (i.toLong, near(c1))) ++
      (10 until 20).map(i => (i.toLong, near(c2)))
    val proj = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"), Similarity.jlProject(col("embedding"), signs)
        .cast("array<float>").as("pvec"))
    val q = proj.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("q_id"), col("pvec"))
    val top = Similarity.bruteForceTopK(proj, q, "vec_id", "q_id", "pvec", k = 9)
      .select("vec_id").as[Long].collect().toSet
    assert(top == (1L to 9L).toSet,
      s"projected neighbors of cluster-1 member must be cluster 1, got $top")
  }

  test("twoStageTopK: recovers exact top-k when the shortlist is deep enough") {
    import spark.implicits._
    val rnd = new scala.util.Random(21)
    val corpus = (0 until 200).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val signs = Similarity.jlSigns(64, 16)
    val exact = Similarity.bruteForceTopK(corpus, queries, "vec_id", "q_id",
        "embedding", k = 5)
      .select("q_id", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // with shortlist = corpus size the composition is EXACTLY brute force
    val full = Similarity.twoStageTopK(corpus, queries, "vec_id", "q_id",
        "embedding", signs, shortlist = 200, k = 5)
      .select("q_id", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(full == exact)
    // a 40-deep shortlist on random vectors keeps most of the true top-5
    val narrow = Similarity.twoStageTopK(corpus, queries, "vec_id", "q_id",
        "embedding", signs, shortlist = 40, k = 5)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactPairs = exact.map(t => (t._1, t._2))
    val recall = narrow.intersect(exactPairs).size.toDouble / exactPairs.size
    assert(recall >= 0.5, s"coarse-pass recall collapsed: $recall")
  }

  test("robustOutliers: median/MAD fence survives pollution that breaks z-scores") {
    import spark.implicits._
    // 45 inliers near 100 + 5 extreme outliers at 10000: the outliers drag
    // a mean/stddev fence wide open (z-score flags nothing at z=3), while
    // the median/MAD fence still catches all 5
    val vals = (0 until 45).map(i => 100.0 + (i % 11) - 5) ++ Seq.fill(5)(10000.0)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, "g", v) }
      .toDF("id", "grp", "v")
    val out = graft.x.Profiler.robustOutliers(df, "v", Seq("grp")).head()
    assert(math.abs(out.getDouble(1) - 100.0) <= 6.0) // median stays with inliers
    assert(out.getLong(3) == 50L && out.getLong(4) == 5L,
      s"MAD fence must flag exactly the 5 extremes, got ${out.getLong(4)}")
    // the moment-based fence is masked: mean ~1090, stddev ~2900 → no flags
    val (mean, std) = (vals.sum / vals.size,
      math.sqrt(vals.map(x => math.pow(x - vals.sum / vals.size, 2)).sum / (vals.size - 1)))
    assert(vals.count(x => math.abs(x - mean) > 3 * std) == 0,
      "precondition: z-score masking must hold for this fixture")
    // degenerate group: MAD = 0 flags everything off the median
    val deg = Seq((1L, "d", 5.0), (2L, "d", 5.0), (3L, "d", 7.0))
      .toDF("id", "grp", "v")
    val d = graft.x.Profiler.robustOutliers(deg, "v", Seq("grp")).head()
    assert(d.getDouble(2) == 0.0 && d.getLong(4) == 1L)
  }

  test("contentDefinedChunks: tiles the doc exactly, re-aligns after insertion") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val body = (0 until 400).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val docs = Seq((1L, body), (2L, "INSERTED PREFIX >> " + body))
      .toDF("doc_id", "text")
    val chunks = Dedup.contentDefinedChunks(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    // coverage: chunks tile [1, len] with no gaps or overlaps
    Seq(1L -> body.length, 2L -> (body.length + 19)).foreach { case (id, len) =>
      val ext = chunks.filter(_._1 == id).sortBy(_._2)
      assert(ext.head._2 == 1 && ext.last._3 == len)
      ext.sliding(2).foreach { case Array((_, _, e1, _), (_, s2, _, _)) =>
        assert(s2 == e1 + 1, s"gap/overlap at $e1 -> $s2 in doc $id")
      case _ => ()
      }
    }
    // insertion robustness: the copy shares most chunk hashes with the
    // original even though every offset shifted by 19 chars — the CDC
    // property fixed-size framing lacks
    val h1 = chunks.filter(_._1 == 1L).map(_._4).toSet
    val h2 = chunks.filter(_._1 == 2L).map(_._4).toSet
    val shared = h1.intersect(h2).size
    assert(shared >= h1.size / 2,
      s"expected most of ${h1.size} chunks shared after prefix insertion, got $shared")
    // determinism under repartitioning
    val again = Dedup.contentDefinedChunks(docs.repartition(7), "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(again.toSet == chunks.toSet)
  }

  test("marginMine: margin demotes the hub target that raw cosine prefers") {
    import spark.implicits._
    def v(parts: (Int, Double)*): Array[Float] = {
      val a = Array.fill(64)(0.0f)
      parts.foreach { case (i, x) => a(i) = x.toFloat }
      a
    }
    val s3 = math.sqrt(3.0)
    // sources on three axes; a hub target equally close (0.577) to ALL of
    // them; a dedicated target for s2 at cosine 0.575 — lower than the hub
    val src = Seq(
      (1L, v(0 -> 1.0)), (2L, v(1 -> 1.0)), (3L, v(2 -> 1.0))
    ).toDF("vec_id", "embedding")
    val tgt = Seq(
      (101L, v(0 -> 1 / s3, 1 -> 1 / s3, 2 -> 1 / s3)), // hub
      (103L, v(1 -> 0.575, 3 -> math.sqrt(1 - 0.575 * 0.575))), // s2's true pair
      (105L, v(4 -> 1.0)) // far from everything
    ).toDF("vec_id", "embedding")
    val mined = Similarity.marginMine(src, tgt, "vec_id", "embedding", k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // raw cosine for s2: hub 0.577 > t2 0.575 — but the hub's high k-NN
    // mean (close to every source) demotes it under margin scoring
    assert(mined(2L) == 103L, s"margin must pick the dedicated pair, got $mined")
    // s1/s3 have no dedicated target: the hub is their best match
    assert(mined(1L) == 101L && mined(3L) == 101L)
  }

  test("datasetCard: exact tokens, share conservation, within-group dup rate") {
    import spark.implicits._
    val docs = Seq(
      (1L, "srcA", "hello world"),          // 2 tokens
      (2L, "srcA", "  Hello   WORLD  "),    // exact dup of 1 after normalize
      (3L, "srcA", "three tokens here"),
      (4L, "srcB", "solo doc")
    ).toDF("doc_id", "source", "text")
    val card = graft.x.Curation.datasetCard(docs, "text", Seq("source"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    val (aDocs, aToks, aShare, aMean, aDup) = card("srcA")
    assert(aDocs == 3 && aToks == 7)
    assert(aMean == 7.0 / 3.0)
    assert(aDup == 1.0 / 3.0, "case/whitespace variants are exact dups")
    val (bDocs, bToks, _, _, bDup) = card("srcB")
    assert(bDocs == 1 && bToks == 2 && bDup == 0.0)
    assert(math.abs(card.values.map(_._3).sum - 1.0) < 1e-12,
      "token shares must conserve the corpus")
    assert(aShare == 7.0 / 9.0)
  }

  test("int8Codes: bounded codes, extreme maps to ±127, zero vector safe") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(2.0f, 1.0f, -2.0f, 0.5f))
    ).toDF("vec_id", "embedding")
    val out = vecs.select(col("vec_id"),
        Similarity.int8Codes(col("embedding")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // v1: maxabs 1.0 -> codes are round(v*127)
    assert(out(1L) == Seq(64, -127, 32, 0)) // floor(63.5+0.5)=64, floor(-127+0.5)=-127
    assert(out(2L) == Seq(0, 0, 0, 0))
    assert(out(3L) == Seq(127, 64, -127, 32))
    assert(out.values.flatten.forall(c => c >= -127 && c <= 127))
    // quantized ranking agrees with exact ranking on separated clusters
    val rnd = new scala.util.Random(13)
    def near(center: Array[Float]) =
      center.map(c => c + (rnd.nextFloat() - 0.5f) * 0.05f)
    val c1 = Array.fill(64)(rnd.nextFloat() * 2 - 1)
    val c2 = Array.fill(64)(rnd.nextFloat() * 2 - 1)
    val corpus = ((0 until 10).map(i => (i.toLong, near(c1))) ++
      (10 until 20).map(i => (i.toLong, near(c2)))).toDF("vec_id", "embedding")
    val codes = corpus.select(col("vec_id"),
      Similarity.int8Codes(col("embedding")).as("codes"))
    val q = codes.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("q_id"), col("codes"))
    val top = Similarity.int8TopK(codes, q, "vec_id", "q_id", "codes", k = 9)
      .select("vec_id").as[Long].collect().toSet
    assert(top == (1L to 9L).toSet, s"quantized neighbors must stay in-cluster: $top")
  }

  test("rrfFuse: both-list hits outrank single-list, absence counts zero, id tiebreak") {
    import spark.implicits._
    val sparse = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("q_id", "doc_id", "rank")
    val dense = Seq((1L, 11L, 1), (1L, 13L, 2), (1L, 12L, 3))
      .toDF("q_id", "doc_id", "rank")
    val out = Similarity.rrfFuse(Seq(sparse, dense), "q_id", "doc_id", "rank", k = 4)
      .orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    // doc 11 (ranks 2+1) and doc 12 (ranks 3+3) appear in both lists;
    // 10 and 13 in one each. Exact expected scores:
    def c(r: Int) = 1.0 / (60.0 + r)
    assert(out.map(_._1).toSeq === Seq(11L, 12L, 10L, 13L))
    assert(out(0)._2 === c(2) + c(1))
    assert(out(1)._2 === c(3) + c(3))
    assert(out(2)._2 === c(1)) // sparse-only: dense contributes exactly 0
    assert(out(3)._2 === c(2))
    // equal fused scores break toward the smaller id
    val tied = Similarity.rrfFuse(
      Seq(Seq((1L, 21L, 1), (1L, 20L, 2)).toDF("q_id", "doc_id", "rank")),
      "q_id", "doc_id", "rank", k = 2).orderBy("rank")
      .collect().map(_.getLong(1)).toSeq
    assert(tied === Seq(21L, 20L)) // distinct ranks: no tie, order by score
    val tied2 = Similarity.rrfFuse(
      Seq(Seq((1L, 31L, 1)).toDF("q_id", "doc_id", "rank"),
        Seq((1L, 30L, 1)).toDF("q_id", "doc_id", "rank")),
      "q_id", "doc_id", "rank", k = 2).orderBy("rank")
      .collect().map(_.getLong(1)).toSeq
    assert(tied2 === Seq(30L, 31L)) // same 1/(60+1) score: id ascending
  }

  test("winnow matches a brute-force rightmost-min reference on random corpora") {
    import spark.implicits._
    import graft.functions.PolyHash56
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val (n, w) = (3, 4)
    val corpus = (0 until 40).map(i => (i.toLong,
      (0 until (1 + rnd.nextInt(25))).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")))
    val expected = corpus.flatMap { case (id, text) =>
      val t = text.trim.toLowerCase.split("\\s+")
      if (t.length < n) Nil
      else {
        val hs = (0 to t.length - n).map(p => PolyHash56.hash(t.slice(p, p + n).mkString(" ")))
        val starts = if (hs.length <= w) Seq(0) else 0 to hs.length - w
        starts.map { s =>
          val win = hs.slice(s, s + w).zipWithIndex.map { case (h, i) => (h, s + i) }
          // rightmost minimum: min hash, ties to the LARGEST position
          val m = win.minBy { case (h, p) => (h, -p) }
          (id, m._2.toLong, m._1)
        }.distinct
      }
    }.toSet
    val actual = TextAnalysis.winnow(corpus.toDF("doc_id", "text"), "text", "doc_id", n, w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(actual == expected)
    // the winnowing coverage guarantee: every full window contributes a selection
    corpus.foreach { case (id, text) =>
      val t = text.trim.toLowerCase.split("\\s+")
      val nGrams = t.length - n + 1
      val sel = actual.filter(_._1 == id).map(_._2)
      if (nGrams >= 1) {
        assert(sel.nonEmpty)
        val starts = if (nGrams <= w) Seq(0) else 0 to nGrams - w
        starts.foreach { s =>
          assert(sel.exists(p => p >= s && p < s + w),
            s"doc $id window at $s has no selected fingerprint")
        }
      }
    }
  }

  test("winnow: shared long runs share a fingerprint; density shrinks the sketch") {
    import spark.implicits._
    // two docs that differ everywhere except a shared (n+w-1)-token run:
    // the guarantee says they must share at least one selected fingerprint
    val shared = "zero one two three four five" // 6 tokens = n+w-1 for (3,4)
    val docs = Seq(
      (1L, s"alpha beta gamma $shared delta epsilon"),
      (2L, s"omicron pi rho sigma $shared tau")).toDF("doc_id", "text")
    val out = TextAnalysis.winnow(docs, "text", "doc_id", n = 3, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val common = out.filter(_._1 == 1L).map(_._2).toSet
      .intersect(out.filter(_._1 == 2L).map(_._2).toSet)
    assert(common.nonEmpty, "shared >= n+w-1 token run must share a fingerprint")
    // rightmost tiebreak on an all-equal-hash doc: n=1, w=3 over "a a a a a"
    // windows [0,2],[1,3],[2,4] each select their rightmost position
    val ties = TextAnalysis.winnow(Seq((9L, "a a a a a")).toDF("doc_id", "text"),
      "text", "doc_id", n = 1, w = 3)
      .collect().map(_.getLong(1)).toSet
    assert(ties == Set(2L, 3L, 4L))
    // sketch is materially smaller than the full gram set: expected
    // density 2/(w+1) = 0.4 on uncorrelated gram hashes (random tokens)
    val rnd = new scala.util.Random(11)
    val doc = (0 until 102).map(_ => rnd.nextLong().toHexString).mkString(" ")
    val full = 100L // grams at n=3
    val k = TextAnalysis.winnow(Seq((3L, doc)).toDF("doc_id", "text"),
      "text", "doc_id", n = 3, w = 4).count()
    assert(k < full * 6 / 10, s"winnowed sketch ($k) should be ~2/(w+1) of $full grams")
  }

  test("weightedSample: scale-invariant, zero-weight-proof, size near target") {
    import spark.implicits._
    val rows = (1L to 1000L).map(i => (i, 100L + (i % 7) * 50L)).toDF("id", "w")
    val kept = Sampling.weightedSample(rows, "id", "w", n = 200)
      .select("id").collect().map(_.getLong(0)).toSet
    // hash-deterministic: size concentrates around n (fixed, not random)
    assert(kept.size > 140 && kept.size < 260, s"size ${kept.size} far from 200")
    // doubling every weight scales both sides of the exact inclusion test
    val doubled = Sampling.weightedSample(
      rows.select($"id", ($"w" * 2).as("w")), "id", "w", n = 200)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(doubled == kept)
    // zero/negative weights can never be selected; layout can't matter
    val withJunk = rows.union(Seq((2000L, 0L), (2001L, -5L)).toDF("id", "w"))
    val k2 = Sampling.weightedSample(withJunk.repartition(13), "id", "w", n = 200)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(k2 == kept && !k2.contains(2000L) && !k2.contains(2001L))
    // p_incl is the πps probability, capped at 1
    val p = Sampling.weightedSample(rows, "id", "w", n = 200)
      .select("p_incl").collect().map(_.getDouble(0))
    assert(p.forall(x => x > 0.0 && x <= 1.0))
  }

  test("psiDrift: identical snapshots give PSI 0; a shifted snapshot doesn't") {
    import spark.implicits._
    val a = (1 to 1000).map(i => i % 100).toDF("v")
    val same = Profiler.psiDrift(a, a, "v", nBuckets = 10, lo = 0.0, hi = 100.0)
      .select("psi").head().getDouble(0)
    assert(same == 0.0, s"identical snapshots must give PSI exactly 0, got $same")
    // shift the mass up by 50: a real distribution move must dominate the
    // smoothing noise (rule of thumb: > 0.25 = investigate)
    val b = (1 to 1000).map(i => 50 + i % 50).toDF("v")
    val moved = Profiler.psiDrift(a, b, "v", nBuckets = 10, lo = 0.0, hi = 100.0)
      .select("psi").head().getDouble(0)
    assert(moved > 0.25, s"a half-range shift must flag, got $moved")
    // bucket counts exclude out-of-range rows on both sides consistently
    val withJunk = a.union(Seq(-5, 500).toDF("v"))
    val j = Profiler.psiDrift(withJunk, a, "v", nBuckets = 10, lo = 0.0, hi = 100.0)
      .select("psi").head().getDouble(0)
    assert(j == 0.0)
  }

  test("recallAtK: self-comparison gives 1; disjoint lists give 0; deep lists truncate") {
    import spark.implicits._
    val exact = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1), (2L, 21L, 2)).toDF("q_id", "vec_id", "rank")
    val self = Similarity.recallAtK(exact, exact, "q_id", "vec_id", k = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(self == Map(1L -> 1.0, 2L -> 1.0))
    // approx missed everything for q1, got 1/2 for q2; rank-4 hits ignored
    val approx = Seq((1L, 99L, 1), (1L, 98L, 2), (1L, 10L, 4),
      (2L, 20L, 1), (2L, 97L, 2)).toDF("q_id", "vec_id", "rank")
    val r = Similarity.recallAtK(approx, exact, "q_id", "vec_id", k = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
    assert(r.toSet == Set((1L, 0L, 3L, 0.0), (2L, 1L, 2L, 0.5)))
  }

  test("int8LloydUpdate: cells move to grid-quantized means, empty cells " +
      "keep their centroid; int8IvfTopK probing every cell equals brute force") {
    import spark.implicits._
    // 2D toy codes: two tight groups near (0,0) and (100,0); centroid 3
    // at (-100,-100) captures nothing and must survive unchanged
    val corpus = Seq(
      (1L, Seq(0, 0)), (2L, Seq(2, 0)), (3L, Seq(0, 3)),
      (4L, Seq(100, 0)), (5L, Seq(104, 0))).toDF("vec_id", "c")
    val cents = Seq((1L, Seq(1, 1)), (2L, Seq(90, 0)), (3L, Seq(-100, -100)))
      .toDF("centroid_id", "c")
    val upd = Similarity.int8LloydUpdate(corpus, cents,
      "vec_id", "centroid_id", "c")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // cell 1 ← {(0,0),(2,0),(0,3)}: means (2/3, 1) → ⌊(2s+n)/(2n)⌋ = (1, 1)
    assert(upd(1L) == Seq(1, 1), s"cell 1 moved to ${upd(1L)}")
    // cell 2 ← {(100,0),(104,0)}: mean (102, 0)
    assert(upd(2L) == Seq(102, 0), s"cell 2 moved to ${upd(2L)}")
    // empty cell 3 keeps its previous centroid
    assert(upd(3L) == Seq(-100, -100), s"empty cell 3 moved to ${upd(3L)}")

    // probing EVERY cell makes IVF exhaustive: results equal int8TopK
    val qs = Seq((10L, Seq(1, 0)), (11L, Seq(99, 1))).toDF("q_id", "c")
    val ivf = Similarity.int8IvfTopK(corpus, qs, cents,
        "vec_id", "q_id", "centroid_id", "c", k = 3, nprobe = 3)
      .select("q_id", "vec_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = Similarity.int8TopK(corpus, qs, "vec_id", "q_id", "c", k = 3)
      .select("q_id", "vec_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(ivf == brute, s"all-cells IVF $ivf != brute force $brute")
  }

  test("ivfRecallDrift: identical quantizers give zero drift; an " +
      "exhaustive fresh quantizer can only improve recall") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val codes = emb.select(col("vec_id"),
      Similarity.int8Codes(col("embedding")).as("c"))
    val corpus = codes.filter(col("vec_id") < 100)
    val qs = codes.filter(col("vec_id") >= 100 && col("vec_id") < 105)
      .select(col("vec_id").as("q_id"), col("c"))
    val cents = codes.filter(col("vec_id") < 4)
      .select(col("vec_id").as("centroid_id"), col("c"))
    val same = Similarity.ivfRecallDrift(corpus, qs, cents, cents,
        "vec_id", "q_id", "centroid_id", "c", k = 5, nprobe = 2)
      .collect()
    assert(same.nonEmpty && same.forall(_.getAs[Double]("drift") == 0.0),
      "same stale and fresh quantizer must give exactly zero drift")
    // fresh probing all 4 cells = exhaustive = recall 1.0, so drift ≥ 0
    // against any nprobe-limited stale geometry and recall_fresh == 1
    val exhaustive = Similarity.int8IvfTopK(corpus, qs, cents,
      "vec_id", "q_id", "centroid_id", "c", k = 5, nprobe = 4)
    val stale = Similarity.int8IvfTopK(corpus, qs, cents,
      "vec_id", "q_id", "centroid_id", "c", k = 5, nprobe = 1)
    val exact = Similarity.int8TopK(corpus, qs, "vec_id", "q_id", "c", k = 5)
    val rx = Similarity.recallAtK(exhaustive, exact, "q_id", "vec_id", k = 5)
      .collect().map(_.getAs[Double]("recall"))
    assert(rx.forall(_ == 1.0), "all-cells probe must recall everything")
    val rs = Similarity.recallAtK(stale, exact, "q_id", "vec_id", k = 5)
      .collect().map(_.getAs[Double]("recall"))
    assert(rs.forall(r => r >= 0.0 && r <= 1.0))
  }

  test("kAnonymize masks sub-k groups only; lDiversityAudit flags homogeneous groups") {
    import spark.implicits._
    val df = Seq(
      (1L, "us", "A"), (2L, "us", "A"), (3L, "us", "B"),
      (4L, "nz", "A")).toDF("id", "geo", "seg")
    val anon = Privacy.kAnonymize(df, Seq("geo"), k = 2)
      .select("id", "geo", "suppressed")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet
    assert(anon == Set((1L, "us", false), (2L, "us", false), (3L, "us", false),
      (4L, "*", true)), s"got $anon")
    val ld = Privacy.lDiversityAudit(df, Seq("geo"), "seg", l = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    assert(ld == Set(("us", 3L, 2L, true), ("nz", 1L, 1L, false)))
  }

  test("collocations: PMI beats independence for real pairs; minCount gates the tail") {
    import spark.implicits._
    // corpus "a b a b a c": unigrams a3 b2 c1 (N=6); bigrams ab:2 ba:2 ac:1 (B=5)
    val docs = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val out = TextAnalysis.collocations(docs, "text", minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out.keySet == Set(("a", "b"), ("b", "a")), s"minCount=2 keeps ab/ba only: $out")
    val exp = math.log((2.0 / 5.0) / ((3.0 / 6.0) * (2.0 / 6.0)))
    assert(math.abs(out(("a", "b"))._2 - exp) < 1e-7 && out(("a", "b"))._1 == 2L)
    // a frequent-but-independent pair scores below a true collocation:
    // "x y" always adjacent vs "p"/"q" co-frequent but shuffled
    val c2 = Seq((1L, "x y x y x y x y p q q p p q q p")).toDF("doc_id", "text")
    val m = TextAnalysis.collocations(c2, "text", minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(m(("x", "y")) > m(("p", "q")))
  }

  test("nullRateDrift: exact rates per column, drift is the b−a difference") {
    import spark.implicits._
    val a = Seq((Some(1), Some("x")), (None, Some("y")), (Some(3), None),
      (Some(4), Some("z"))).toDF("v", "s")
    val b = Seq[(Option[Int], Option[String])]((None, Some("x")), (None, None)).toDF("v", "s")
    val out = Profiler.nullRateDrift(a, b, Seq("v", "s"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out("v") == ((0.25, 1.0, 0.75)))
    assert(out("s") == ((0.25, 0.5, 0.25)))
  }

  test("stupidBackoff: all three tiers fire with the published α weighting") {
    import spark.implicits._
    // LM: unigrams a2 b2 c1 d1 (N=6, V=4); bigrams ab:2 bc:1 ca:1 bd:1;
    // trigrams abc bca cab abd
    val lm = Seq((0L, "a b c a b d")).toDF("doc_id", "text")
    val docs = Seq((1L, "a b c x y z"), (2L, "d a b")).toDF("doc_id", "text")
    val out = TextAnalysis.stupidBackoffLogProb(docs, lm, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // doc 1: (a,b,c) tier-1 ln(1/2); (b,c,x),(c,x,y),(x,y,z) tier-3
    // ln(α²·1/10); doc 2: (d,a,b) unseen trigram but bigram ab exists →
    // tier-2 ln(α·2/2)
    val exp1 = -(math.log(1.0 / 2.0) + 3 * math.log(0.4 * 0.4 * 1.0 / 10.0)) / 4
    val exp2 = -math.log(0.4 * 2.0 / 2.0)
    assert(out(1L)._1 == 4L && math.abs(out(1L)._2 - exp1) < 1e-6, s"got ${out(1L)}")
    assert(out(2L)._1 == 1L && math.abs(out(2L)._2 - exp2) < 1e-6, s"got ${out(2L)}")
  }

  test("dsirWeights: target≡raw zeroes every λ; target-vocab docs outrank off-vocab") {
    import spark.implicits._
    val docs = Seq(
      (1L, "wiki article about science and history"),
      (2L, "buy cheap pills online now discount"),
      (3L, "science history article encyclopedia entry"),
      (4L, "click here casino bonus free spins")).toDF("doc_id", "text")
    // degenerate target = raw: tc==rc and T==R make every smoothed λ
    // exactly ln(1) = 0, so llr is exactly zero for all docs
    val same = TextAnalysis.dsirWeights(docs, docs, "text", "doc_id", nBuckets = 64)
      .select("llr").collect().map(_.getDecimal(0))
    assert(same.forall(_.signum == 0), s"target≡raw must give llr=0, got ${same.toSeq}")
    // a wiki-like target lifts wiki-vocabulary docs above spam-vocabulary docs
    val target = docs.filter($"doc_id" === 1L || $"doc_id" === 3L)
    val w = TextAnalysis.dsirWeights(docs, target, "text", "doc_id", nBuckets = 4096)
      .collect().map(r => r.getLong(0) -> r.getDecimal(2).doubleValue()).toMap
    assert(w(1L) > w(2L) && w(3L) > w(4L) && w(1L) > w(4L),
      s"target-like docs must outrank off-target docs: $w")
    // partitioning invariance: the exact-decimal weights and the resampled
    // set cannot depend on the physical layout
    val a = TextAnalysis.dsirResample(docs.repartition(7), target, "text", "doc_id", n = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = TextAnalysis.dsirResample(docs.coalesce(1), target, "text", "doc_id", n = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b && a.size == 2)
  }

  test("kneserNey: continuation probability beats raw frequency in unseen contexts") {
    import spark.implicits._
    // "francisco": frequent but completes only ONE context ("san").
    // "report": same total frequency but completes many contexts. After
    // an unseen context word, KN must prefer "report" — the property the
    // continuation distribution exists for (raw-frequency backoff,
    // x94-style, scores them equally).
    val lm = (
      Seq.fill(6)("san francisco") ++
      Seq("the report", "a report", "my report", "our report", "his report",
        "her report")
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val probes = Seq((100L, "zzz francisco"), (101L, "zzz report"))
      .toDF("doc_id", "text")
    val got = graft.x.TextAnalysis
      .kneserNeyLogProb(probes, lm, "text", "doc_id")
      .select("doc_id", "mean_nll").as[(Long, Double)].collect().toMap
    assert(got(101L) < got(100L),
      s"many-context 'report' must score better (lower NLL): $got")
    // seen bigrams score far better than the smoothed floor
    val seen = graft.x.TextAnalysis
      .kneserNeyLogProb(Seq((102L, "san francisco")).toDF("doc_id", "text"),
        lm, "text", "doc_id")
      .select("mean_nll").as[Double].head()
    assert(seen < got(101L), s"seen bigram NLL $seen must beat unseen $got")
  }

  test("mmrSelect demotes near-duplicates of already-selected candidates") {
    import spark.implicits._
    // one query; candidates: id 1 and 2 are identical high-relevance
    // vectors, id 3 is orthogonal with lower relevance. Plain top-3 by rel
    // picks (1, 2, 3); MMR must pick 1, then skip the duplicate 2 in
    // favor of the diverse 3.
    val e1 = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val e2 = Array(0.0f, 1.0f, 0.0f, 0.0f)
    val cands = Seq(
      (10L, 1L, 1.00, e1), (10L, 2L, 0.99, e1), (10L, 3L, 0.50, e2))
      .toDF("q_id", "id", "rel", "embedding")
    val got = graft.x.Similarity
      .mmrSelect(cands, "q_id", "id", "rel", "embedding", k = 3, lambda = 0.5)
      .orderBy("rank").select("id").as[Long].collect().toSeq
    assert(got == Seq(1L, 3L, 2L), s"MMR order was $got")
    // rank 1 is always the pure-relevance argmax; picks never repeat
    assert(got.distinct == got)
    // λ=1 degenerates to pure relevance ordering
    val rel = graft.x.Similarity
      .mmrSelect(cands, "q_id", "id", "rel", "embedding", k = 3, lambda = 1.0)
      .orderBy("rank").select("id").as[Long].collect().toSeq
    assert(rel == Seq(1L, 2L, 3L), s"λ=1 order was $rel")
    // strict typing: a mistyped candidate struct is an ANALYSIS error —
    // the runner reads fields type-punned, so without the check a
    // (int, float, array<double>) struct would yield garbage, not fail
    val bad = Seq((10, 1, 1.0f, Array(1.0, 0.0)))
      .toDF("q_id", "id", "rel", "embedding")
      .groupBy("q_id")
      .agg(org.apache.spark.sql.functions.collect_list(
        org.apache.spark.sql.functions.struct(
          org.apache.spark.sql.functions.col("id"),
          org.apache.spark.sql.functions.col("rel"),
          org.apache.spark.sql.functions.col("embedding"))).as("cands"))
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(graft.functions.MmrSelectExpr.select(
        org.apache.spark.sql.functions.col("cands"), 2, 0.5)).collect()
    }
    assert(err.getMessage.contains("mmr_select expects"), err.getMessage)
    // ...but the PUBLIC helper stays tolerant: array<double> embeddings
    // (the common Scala/SQL shape) are cast before the strict expression
    val dbl = Seq(
      (10L, 1L, 1.00, e1.map(_.toDouble)), (10L, 2L, 0.99, e1.map(_.toDouble)),
      (10L, 3L, 0.50, e2.map(_.toDouble)))
      .toDF("q_id", "id", "rel", "embedding")
    val gotDbl = graft.x.Similarity
      .mmrSelect(dbl, "q_id", "id", "rel", "embedding", k = 3, lambda = 0.5)
      .orderBy("rank").select("id").as[Long].collect().toSeq
    assert(gotDbl == Seq(1L, 3L, 2L), s"double-embedding MMR order was $gotDbl")
  }

  test("audioActivitySegments: segments are aligned, contiguous window " +
      "runs over audio media only") {
    val media = graft.x.Multimodal.synthesizeFromText(docs, "doc_id", "text")
    val segs = graft.x.Multimodal.audioActivitySegments(spark, media, 5000L)
      .collect()
    assert(segs.nonEmpty, "no active segments found")
    val audioIds = media.filter(col("meta.kind") === "audio")
      .select("media_id").collect().map(_.getLong(0)).toSet
    segs.foreach { r =>
      val (id, s0, s1, n) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(audioIds.contains(id), s"segment on non-audio media $id")
      assert(s0 % 5000 == 0 && s1 % 5000 == 0 && s1 >= s0)
      // a contiguous run: span/everyMs + 1 windows exactly
      assert((s1 - s0) / 5000 + 1 == n, s"segment ($s0,$s1) claims $n windows")
    }
    // segments of the same media never overlap or touch (else they'd
    // have been merged into one island)
    segs.groupBy(_.getLong(0)).values.foreach { ss =>
      val sorted = ss.sortBy(_.getLong(1))
      sorted.sliding(2).filter(_.length == 2).foreach { pair =>
        val (p, q) = (pair(0), pair(1))
        assert(q.getLong(1) > p.getLong(2) + 5000,
          s"adjacent segments not merged: $p | $q")
      }
    }
  }

  test("vocabGrowth: cumulative vocab counts first occurrences once; " +
      "totals match corpus-wide distinct and token counts") {
    // ids 0..3, buckets=2 -> bucket 1 = ids 0,1; bucket 2 = ids 2,3
    val d = Seq((0L, "a b a"), (1L, "b c"), (2L, "c d e"), (3L, ""))
      .toDF("doc_id", "text")
    val got = TextAnalysis.vocabGrowth(d, "doc_id", "text", buckets = 2)
      .orderBy("bucket").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // bucket1: 2 docs, 5 tokens, vocab {a,b,c} = 3
    // bucket2: 4 docs, 8 tokens, vocab {a..e} = 5 (c NOT recounted)
    assert(got.toSeq === Seq((1, 2L, 5L, 3L), (2, 4L, 8L, 5L)),
      s"growth curve wrong: ${got.toSeq}")
  }

  test("lcsPairs: reordered sentences keep high LCS where levenshtein " +
      "would crater; threshold is exact") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "s"),
      (2L, "the quick brown fox leaps over the lazy dog", "s"), // 1 sub
      (3L, "over the lazy dog the quick brown fox jumps", "s"), // rotated
      (4L, "completely different words entirely here now today ok", "s"))
      .toDF("doc_id", "text", "blk")
    val got = Dedup.lcsPairs(d, "text", "doc_id", "blk", minRatioPct = 60,
        gateChars = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // (1,2): 8 of 9 tokens align in order; (1,3): rotation keeps an
    // LCS of 5 ("the quick brown fox jumps" or the tail block) => 5/9
    // misses 60%; (x,4) shares nothing
    assert(got.keySet === Set((1L, 2L)), s"pairs: $got")
    assert(got((1L, 2L)) === 8L)
    // lowering the bar admits the rotation with its exact LCS
    val loose = Dedup.lcsPairs(d, "text", "doc_id", "blk", minRatioPct = 40,
        gateChars = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(loose((1L, 3L)) === 5L, s"rotated LCS: $loose")
    // the default prefix gate keeps the shared-opening pair but removes
    // the rotated one from the DP's pair surface (documented recall
    // tradeoff: diverging openings are editDistancePairs territory)
    val gatedPairs = Dedup.lcsPairs(d, "text", "doc_id", "blk",
        minRatioPct = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gatedPairs === Set((1L, 2L)), s"gated pairs: $gatedPairs")
  }

  test("farthestFirstSeeds: max-min traversal picks the extremes first, " +
      "ties to min id, running min distances correct") {
    // 1D-ish points in dim 2 so int8 codes stay the raw values:
    // ids 1..5 at x = 0, 1, 10, 50, 100 (y = 127 constant anchor
    // keeps maxabs = 127 so codes are exact)
    val vs = Seq((1L, Array(0f, 127f)), (2L, Array(1f, 127f)),
      (3L, Array(10f, 127f)), (4L, Array(50f, 127f)), (5L, Array(100f, 127f)))
      .toDF("vec_id", "embedding")
    val codes = vs.select(col("vec_id"),
      Similarity.int8Codes(col("embedding")).as("c"))
    val got = Similarity.farthestFirstSeeds(codes, "vec_id", "c", k = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // seed1 = min id (x=0); seed2 = farthest (x=100, d=100²); seed3:
    // min-dists are then min(x², (x−100)²): 1→2500 (x=50) is the max
    assert(got.toSeq === Seq((1, 1L, 0L), (2, 5L, 10000L), (3, 4L, 2500L)),
      s"seed traversal wrong: ${got.toSeq}")
  }

  test("kmeansLloyd: assignments and grid-quantized centroid updates " +
      "are hand-checkable; distance ties break to the smaller cid") {
    val vs = Seq((1L, Array(0f, 127f)), (2L, Array(1f, 127f)),
      (3L, Array(10f, 127f)), (4L, Array(50f, 127f)), (5L, Array(100f, 127f)))
      .toDF("vec_id", "embedding")
    val codes = vs.select(col("vec_id"),
      Similarity.int8Codes(col("embedding")).as("c"))
    val got = Similarity.kmeansLloyd(codes, "vec_id", "c", k = 2, iters = 2,
        dim = 2)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    // seeds: id1 (x=0) and id5 (x=100). Round 1: id4 ties (2500 vs 2500)
    // → cid 1; update puts c1 at x=⌊(2·61+4)/8⌋=15. Round 2 distances
    // to x=15: 225, 196, 25, 1225; id5 stays at its own seed (0).
    assert(got === Map(1L -> ((1, 225L)), 2L -> ((1, 196L)),
      3L -> ((1, 25L)), 4L -> ((1, 1225L)), 5L -> ((2, 0L))),
      s"lloyd assignment wrong: $got")
  }

  test("simplifiedSilhouette: hand-checked per-cluster means on the 1D " +
      "fixture; singleton cluster at its centroid scores 1") {
    val vs = Seq((1L, Array(0f, 127f)), (2L, Array(1f, 127f)),
      (3L, Array(10f, 127f)), (4L, Array(50f, 127f)), (5L, Array(100f, 127f)))
      .toDF("vec_id", "embedding")
    val codes = vs.select(col("vec_id"),
      Similarity.int8Codes(col("embedding")).as("c"))
    val got = Similarity.simplifiedSilhouette(codes, "vec_id", "c", k = 2,
        iters = 2, dim = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    // cluster 1 = {1,2,3,4} at x=15: s = .9775, .98000204, .99691358,
    // .51 (each term pre-rounded to 8 dp) → mean .866104
    assert(got(1L)._1 === 4L && math.abs(got(1L)._2 - 0.866104) < 1e-6,
      s"cluster-1 silhouette: ${got(1L)}")
    // singleton at its own centroid: a = 0, b > 0 → s = 1
    assert(got(2L) === ((1L, 1.0)), s"cluster-2 silhouette: ${got(2L)}")
  }

  test("gramMatrix: exact upper-triangle moments; one Exchange; " +
      "topEigen recovers the dominant direction") {
    // 3 vectors in dim 3, already integer so int8 codes are v/maxabs*127
    // rounded — use vectors whose codes are easy to hand-check
    val vs = Seq(Array(1f, 0f, 0f), Array(1f, 1f, 0f), Array(0f, 0f, 1f))
      .toDF("embedding")
    val codes = vs.select(Similarity.int8Codes(col("embedding")).as("c"))
    val g = Similarity.gramMatrix(codes, "c", dim = 3)
    val got = g.collect().map(r =>
      (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    // codes: (127,0,0), (127,127,0), (0,0,127)
    val d = 127L * 127L
    assert(got === Map((1, 1) -> 2 * d, (1, 2) -> d, (1, 3) -> 0L,
      (2, 2) -> d, (2, 3) -> 0L, (3, 3) -> d))
    // single aggregation: exactly one shuffle Exchange in the executed
    // plan (AdaptiveSparkPlan's toString would double-print the initial
    // plan, so collect the nodes instead of grepping the string)
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val executed = g.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // post-AQE the shuffle sits inside QueryStage leaves that plain
    // collect() does not descend into, so count on the rendered tree of
    // the FINAL plan only (the un-unwrapped AdaptiveSparkPlanExec string
    // would double-print via its embedded initial plan)
    val exchanges = executed.toString().linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 1,
      s"expected 1 Exchange, plan had $exchanges:\n$executed")
    // dominant eigenvector of the gram concentrates on dims 1-2
    val upper = g.collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    val (lambda, v) = Similarity.topEigen(upper, dim = 3)
    assert(lambda > 0.0)
    assert(math.abs(v(0)) > math.abs(v(2)) && math.abs(v(1)) > math.abs(v(2)))
  }
}
