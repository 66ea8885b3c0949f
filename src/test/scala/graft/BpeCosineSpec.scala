package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.x.TextAnalysis

/** BPE merge learning + tf-cosine join: the merge sequence must replay the
  * reference greedy algorithm exactly (Sennrich's low/lower example), and
  * the inverted-index cosine must equal the hand-computed values. */
class BpeCosineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bpeMerges replays the classic low/lower sequence deterministically") {
    // vocabulary: low ×3, lower ×1 → pairs (l,o):4 (o,w):4 (w,e):1 (e,r):1
    // round 1: tie (l,o)/(o,w) breaks lexicographically → (l,o)
    // round 2: (lo,w):4 wins; round 3: tie (e,r)/(low,e) → (e,r)
    val docs = Seq(Tuple1("low low low lower")).toDF("text")
    val merges = TextAnalysis.bpeMerges(docs, "text", k = 3)
    assert(merges == Seq(("l", "o", 4L), ("lo", "w", 4L), ("e", "r", 1L)))
  }

  test("bpeMerges merges greedily left-to-right within a word") {
    // "aaa": pairs (a,a):2 → merge (a,a); greedy rewrite gives [aa, a],
    // NOT [a, aa] — round 2's top pair must therefore be (aa, a)
    val docs = Seq(Tuple1("aaa")).toDF("text")
    val merges = TextAnalysis.bpeMerges(docs, "text", k = 2)
    assert(merges == Seq(("a", "a", 2L), ("aa", "a", 1L)))
  }

  test("batched bpeMerges replays the one-at-a-time sequence exactly") {
    // real-text fixture: plenty of count ties, shared-symbol top pairs and
    // concat collisions, so every safety condition in the batch selector
    // gets exercised; maxBatch=1 IS the sequential reference
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    val sequential = TextAnalysis.bpeMerges(docs, "text", k = 24, maxBatch = 1)
    val batched = TextAnalysis.bpeMerges(docs, "text", k = 24, maxBatch = 8)
    assert(batched == sequential)
    assert(batched.length == 24)
  }

  test("bpeSegment applies merges in order, greedy within words") {
    val docs = Seq((1L, "low lower"), (2L, "wow")).toDF("doc_id", "text")
    // merges from the classic example: (l,o), (lo,w), (e,r)
    val got = TextAnalysis.bpeSegment(docs, "text", "doc_id",
      Seq(("l", "o"), ("lo", "w"), ("e", "r"))).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // "low"→[low]=1, "lower"→[low,er]=2 → 3; "wow" has no merge pair
    // except none apply (w o w) → 3 chars
    assert(got == Map(1L -> 3L, 2L -> 3L))
  }

  test("weightedQuantile: exact reach test, ties share cumulative weight") {
    val df = Seq(("g", 1.0, 1L), ("g", 2.0, 1L), ("g", 2.0, 1L), ("g", 9.0, 1L),
      ("h", 5.0, 97L), ("h", 6.0, 1L), ("h", 7.0, 1L)).toDF("grp", "v", "w")
    val got = graft.x.Profiler.weightedQuantile(df, "v", "w", Seq("grp"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    // g: total 4, cum at v=2 is 3 ≥ 2 → median 2.0 (both ties share cum 3)
    assert(got("g") == ((2.0, 4L)))
    // h: the heavy first value already reaches half
    assert(got("h") == ((5.0, 99L)))
  }

  test("tfCosinePairs matches hand-computed cosines and honors the df cap") {
    val docs = Seq(
      (1L, "a a b"),
      (2L, "a a b"),   // identical rates → cos 1 with 1
      (3L, "a b b"),   // dot 4, norms 5 → 0.8 with 1
      (4L, "z z q")).toDF("doc_id", "text")
    val pairs = TextAnalysis.tfCosinePairs(docs, "text", "doc_id", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairs == Set((1L, 2L, 1.0)))
    val loose = TextAnalysis.tfCosinePairs(docs, "text", "doc_id", threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // df cap 2: "a" and "b" appear in 3 docs → dropped; no vectors remain
    // for docs 1-3, and doc 4 has no partner
    val capped = TextAnalysis.tfCosinePairs(docs, "text", "doc_id",
      threshold = 0.1, maxDocFreq = 2)
    assert(capped.count() == 0)
  }

  test("tokenJsDivergence: identical -> 0, disjoint -> ln 2, symmetric") {
    import spark.implicits._
    val a = Seq((1L, "x y z x"), (2L, "y z")).toDF("doc_id", "text")
    val same = TextAnalysis.tokenJsDivergence(a, a, "text").head()
    assert(same.getDouble(5) === 0.0 && same.getDouble(6) === 0.0, s"got $same")
    assert(same.getLong(0) == 6L && same.getLong(4) == 3L)
    // disjoint vocabularies: JS = ln 2 nats = 1 bit exactly
    val b = Seq((1L, "p q r")).toDF("doc_id", "text")
    val dis = TextAnalysis.tokenJsDivergence(a, b, "text").head()
    assert(dis.getLong(4) == 0L)
    assert(math.abs(dis.getDouble(5) - math.log(2.0)) < 1e-6, s"got $dis")
    assert(dis.getDouble(6) === 1.0)
    // symmetry: JS(P,Q) = JS(Q,P)
    val ab = TextAnalysis.tokenJsDivergence(a, b, "text").head().getDouble(5)
    val ba = TextAnalysis.tokenJsDivergence(b, a, "text").head().getDouble(5)
    assert(ab === ba)
    // skewed but overlapping sits strictly between
    val c = Seq((1L, "x x x x y")).toDF("doc_id", "text")
    val mid = TextAnalysis.tokenJsDivergence(a, c, "text").head().getDouble(5)
    assert(mid > 0.0 && mid < math.log(2.0), s"got $mid")
  }

  test("zipfFit: synthetic power law recovers slope ~ -1; degenerate NULL") {
    import spark.implicits._
    // corpus with term t_r repeated floor(256/r) times, r = 1..32: an
    // almost-exact Zipf corpus; OLS on the exact log points must land
    // near slope -1 with high r2
    val words = (1 to 32).flatMap(r => Seq.fill(256 / r)(s"t$r"))
    val docs = words.grouped(40).zipWithIndex
      .map { case (w, i) => (i.toLong, w.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val z = TextAnalysis.zipfFit(docs, "text").head()
    assert(z.getLong(0) == 32L)
    assert(math.abs(z.getDouble(1) - (-1.0)) < 0.05, s"slope ${z.getDouble(1)}")
    assert(z.getDouble(3) > 0.99, s"r2 ${z.getDouble(3)}")
    // a single term: one point, den = 0 -> NULL fit, not garbage
    val one = TextAnalysis.zipfFit(Seq((1L, "only only")).toDF("doc_id", "text"),
      "text").head()
    assert(one.getLong(0) == 1L && one.isNullAt(1) && one.isNullAt(3))
    // layout invariance: exact decimal moments ignore partitioning
    val z2 = TextAnalysis.zipfFit(docs.repartition(7), "text").head()
    assert(z.toString === z2.toString)
  }
}
