package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SchkTest}
import org.apache.spark.sql.functions._
import graft.operators.{Scd2, Validations}
import graft.x.Dedup
import java.sql.Timestamp

/** ScalaCheck properties from SURVEY.md §5.2: SCD2 invariants under random
  * update streams (composite business keys included) and dedup idempotence
  * under arbitrary duplication. Kept to few-but-meaningful cases since each
  * case runs Spark jobs. */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val params = SchkTest.Parameters.default.withMinSuccessfulTests(8)
  private def check(p: Prop): Unit = {
    val r = SchkTest.check(params, p)
    assert(r.passed, r.status.toString)
  }

  test("SCD2 invariants hold for random update streams over composite keys") {
    val genBatch: Gen[Map[(Int, String), Int]] = Gen.mapOf(Gen.zip(
      Gen.zip(Gen.choose(1, 15), Gen.oneOf("eu", "us")), Gen.choose(0, 5)))
    val genStream = Gen.nonEmptyListOf(genBatch).map(_.take(3))
    check(Prop.forAll(genStream) { batches =>
      val keys = Seq("k1", "k2")
      def frame(m: Map[(Int, String), Int]) =
        m.toSeq.map { case ((a, b), v) => (a, b, v) }.toDF("k1", "k2", "v")
      val init = batches.head
      var dim = Scd2.initialize(frame(if (init.isEmpty) Map((1, "eu") -> 0) else init),
        Timestamp.valueOf("2024-01-01 00:00:00"))
      batches.tail.zipWithIndex.foreach { case (b, i) =>
        if (b.nonEmpty)
          dim = Scd2.merge(dim, frame(b), keys, Seq("v"),
            Timestamp.valueOf(s"2024-0${i + 2}-01 00:00:00")).localCheckpoint()
      }
      val oneCurrentPerKey = dim.filter(col(Scd2.IsCurrent))
        .groupBy("k1", "k2").count().filter($"count" =!= 1).isEmpty
      val closedHaveEnd = dim.filter(!col(Scd2.IsCurrent) && col(Scd2.EffectiveTo).isNull).isEmpty
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("k1", "k2").orderBy(Scd2.EffectiveFrom)
      val gapless = dim
        .withColumn("nf", lead(Scd2.EffectiveFrom, 1).over(w))
        .filter($"nf".isNotNull)
        .filter(col(Scd2.EffectiveTo).isNull || col(Scd2.EffectiveTo) =!= $"nf")
        .isEmpty
      oneCurrentPerKey && closedHaveEnd && gapless
    })
  }

  test("dedup is idempotent and keeps exactly one row per key") {
    val genRows: Gen[List[(Int, Int, String)]] = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(1, 10), Gen.choose(1, 100), Gen.alphaStr.map(_.take(5))))
    check(Prop.forAll(genRows) { rows =>
      val df = rows.toDF("k", "ord", "payload")
      val once = Validations.dedup(df, Seq("k"), Seq("ord", "payload"))
      val twice = Validations.dedup(once.good, Seq("k"), Seq("ord", "payload"))
      val nKeys = rows.map(_._1).distinct.size
      once.good.count() == nKeys &&
        twice.bad.count() == 0 &&
        once.good.exceptAll(twice.good).isEmpty
    })
  }

  test("exact content dedup: output row count equals distinct contents, stable under re-dedup") {
    val genDocs: Gen[List[String]] = Gen.nonEmptyListOf(Gen.oneOf(
      "alpha beta gamma", "delta epsilon", "zeta eta theta", "alpha beta gamma "))
    check(Prop.forAll(genDocs) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val d1 = Dedup.exactByContent(df, "text", "doc_id")
      val d2 = Dedup.exactByContent(d1, "text", "doc_id")
      d1.count() == docs.distinct.size && d1.count() == d2.count()
    })
  }

  test("frequent-items sketch: MG guarantees hold vs exact counts on random streams") {
    import graft.functions.FrequentItemsAgg
    val genStream: Gen[(List[String], Int)] = Gen.zip(
      Gen.listOfN(400, Gen.frequency(
        (5, Gen.const("hot")),
        (2, Gen.oneOf("warm1", "warm2")),
        (3, Gen.choose(0, 200).map(i => s"cold$i")))),
      Gen.choose(2, 12))
    check(Prop.forAll(genStream) { case (items, m) =>
      if (items.isEmpty) true
      else {
        val df = items.toDF("item").repartition(5)
        val sk = df.agg(FrequentItemsAgg.frequentItems(col("item"), m).as("sk"))
          .select(explode(col("sk")).as("e")).select("e.term", "e.count", "e.error")
          .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
        val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val n = items.size.toLong
        val capOk = sk.size <= m
        // presence: every item above n/(m+1) tracked
        val presOk = exact.filter(_._2 > n / (m + 1)).keys.forall(sk.contains)
        // two-sided interval brackets the true count for every tracked item
        val boundsOk = sk.forall { case (t, (c, e)) =>
          val truth = exact.getOrElse(t, 0L); c >= truth && c - e <= truth
        }
        capOk && presOk && boundsOk
      }
    })
  }

  test("paragraphDedup: kept paragraphs = distinct paragraphs, each at its first occurrence") {
    val paraPool = Seq("aa bb", "cc dd", "ee ff", "gg hh", "ii jj")
    val genDocs: Gen[List[List[String]]] = Gen.nonEmptyListOf(
      Gen.nonEmptyListOf(Gen.oneOf(paraPool)).map(_.take(4))).map(_.take(6))
    check(Prop.forAll(genDocs) { docLists =>
      val df = docLists.zipWithIndex
        .map { case (ps, i) => (i.toLong, ps.mkString("\n\n")) }
        .toDF("doc_id", "text")
      val out = Dedup.paragraphDedup(df, "text", "doc_id").collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
      // every distinct paragraph survives exactly once, corpus-wide
      val keptParas = out.values.flatMap(_._1.split("\n\n")).filter(_.nonEmpty).toList
      val allParas = docLists.flatten
      val exactlyOnce = keptParas.sorted == allParas.distinct.sorted
      // and it survives at its lexicographically-first (doc, pos) occurrence
      val firstOcc = allParas.distinct.map { p =>
        val (d, ps) = docLists.zipWithIndex.map(_.swap)
          .flatMap { case (i, l) => l.zipWithIndex.filter(_._1 == p).map(z => (i.toLong, z._2)) }
          .minBy(identity)
        p -> d
      }.toMap
      val placedOk = out.forall { case (doc, (text, _, _)) =>
        text.split("\n\n").filter(_.nonEmpty).forall(p => firstOcc(p) == doc)
      }
      // counts audit: totals conserved
      val totalsOk = out.values.map(_._3).sum == allParas.size
      exactlyOnce && placedOk && totalsOk
    })
  }

  test("containment dominates jaccard: same threshold ⇒ superset of pairs") {
    // overlap/min-size ≥ overlap/union for every pair, so at any threshold
    // the containment pair set must contain the jaccard pair set — a
    // structural law of the two measures, checked over random corpora
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    val genDoc = Gen.choose(4, 12).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val genDocs = Gen.choose(3, 8).flatMap(n => Gen.listOfN(n, genDoc))
    check(Prop.forAll(genDocs) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      def pairs(d: org.apache.spark.sql.DataFrame) =
        d.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val jac = pairs(Dedup.ngramJaccardPairs(df, "text", "doc_id", n = 2, threshold = 0.4))
      val con = pairs(Dedup.containmentPairs(df, "text", "doc_id", n = 2, threshold = 0.4))
      jac.subsetOf(con)
    })
  }

  test("merkleDrill localizes every random edit set to exactly its paths") {
    val genEdits: Gen[Set[Int]] =
      Gen.nonEmptyContainerOf[Set, Int](Gen.choose(0, 199)).map(_.take(6))
    check(Prop.forAll(genEdits) { edits =>
      val base = spark.range(0, 200).select(
        col("id"), (col("id") * 7 % 1000).as("v"))
      val hit = col("id").isin(edits.toSeq.map(_.toLong): _*)
      val edited = base.withColumn("v",
        when(hit, col("v") + 1).otherwise(col("v")))
      val key = col("id").cast("string")
      def row = concat(key, lit("|"), col("v").cast("string"))
      val diff = Validations.merkleDrill(base, edited, key, row, levels = 2)
        .collect()
      // every differing leaf is an edit (equal counts), the count of
      // differing leaves never exceeds the edit count, and each edited
      // key's level-2 path appears in the diff
      val pathsOk = diff.forall(r =>
        r.getAs[Long]("a_cnt") == r.getAs[Long]("b_cnt"))
      val editPaths = edits.map { e =>
        val h = graft.functions.PolyHash56.hash(e.toString)
        (h % 256, (h >> 8) % 256)
      }
      val diffPaths = diff.map(r =>
        (r.getAs[Long]("leaf_1"), r.getAs[Long]("leaf_2"))).toSet
      pathsOk && diff.length <= edits.size && editPaths == diffPaths
    })
  }

  test("tokenBudgetSelect: monotone in budget, never over, order-greedy") {
    val genRows: Gen[List[(Int, Int)]] = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0, 50), Gen.choose(0, 9))).map(
      _.zipWithIndex.map { case ((t, p), i) => (i, t * 10 + p) }.take(40))
    check(Prop.forAll(genRows) { rows =>
      // synth: id unique, tokens in [0,500], priority derived (ties common)
      val df = rows.map { case (id, x) => (id.toLong, (x % 97).toLong, (x % 5) / 4.0) }
        .toDF("id", "toks", "pri").repartition(3)
      val budgets = Seq(0L, 50L, 200L, 100000L)
      val sels = budgets.map(b => b ->
        graft.x.Sampling.tokenBudgetSelect(df, "id", "toks", "pri", b)
          .select("id", "cum_tokens").collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap)
      // within budget; monotone: a bigger budget keeps a superset with
      // identical cum values on the shared prefix
      sels.forall { case (b, m) => m.values.forall(_ <= b) } &&
        sels.sliding(2).forall {
          case Seq((_, small), (_, big)) =>
            small.keySet.subsetOf(big.keySet) &&
              small.forall { case (id, c) => big(id) == c }
          case _ => true
        }
    })
  }

  test("topKBy equals the window formulation on random frames and k") {
    val genCase: Gen[(List[(Int, Int, Int)], Int)] = Gen.zip(
      Gen.nonEmptyListOf(Gen.zip(Gen.choose(0, 4), Gen.choose(0, 9),
        Gen.choose(0, 999))).map(_.take(120)),
      Gen.choose(1, 6))
    check(Prop.forAll(genCase) { case (rows, k) =>
      // ord collides heavily (10 values) so ties exercise the item order;
      // ids may repeat across rows — the contract only needs a total order
      val df = rows.zipWithIndex
        .map { case ((g, v, _), i) => (s"g$g", v.toDouble, i.toLong) }
        .toDF("g", "v", "id").repartition(5)
      val viaAgg = df.groupBy(col("g"))
        .agg(graft.functions.TopKAgg.topKBy(col("v"), col("id"), k).as("tk"))
        .select(col("g"), posexplode(col("tk")))
        .select(col("g"), (col("pos") + 1).cast("long").as("rn"),
          col("col.ord"), col("col.item"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("g")).orderBy(col("v").desc, col("id"))
      val viaWin = df.withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= k)
        .select(col("g"), col("rn"), col("v"), col("id"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .toSet
      viaAgg == viaWin
    })
  }

  test("cmsJoinSizeEstimate upper-bounds the true join size on random key multisets") {
    val genSides: Gen[(List[Int], List[Int])] = Gen.zip(
      Gen.nonEmptyListOf(Gen.choose(0, 30)).map(_.take(200)),
      Gen.nonEmptyListOf(Gen.choose(10, 40)).map(_.take(200)))
    check(Prop.forAll(genSides) { case (ka, kb) =>
      val a = ka.map(i => s"k$i").toDF("k")
      val b = kb.map(i => s"k$i").toDF("k")
      val est = graft.x.Sketches.cmsJoinSizeEstimate(
        graft.x.Sketches.cmsBuild(a, "k"), graft.x.Sketches.cmsBuild(b, "k"))
        .head().getLong(0)
      val ca = ka.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val exact = kb.groupBy(identity).view.mapValues(_.size.toLong)
        .map { case (key, cb) => ca.getOrElse(key, 0L) * cb }.sum
      est >= exact
    })
  }

  test("associationRules: supports consistent, confidence bounds, lift symmetry") {
    val genBaskets: Gen[List[(Int, Int)]] = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0, 12), Gen.choose(0, 8))).map(_.take(80))
    check(Prop.forAll(genBaskets) { memb =>
      val df = memb.map { case (b, i) => (b.toLong, s"i$i") }.toDF("basket", "item")
      val rules = graft.x.Graph.associationRules(df, "basket", "item", minSupport = 1)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getDouble(5), r.getDouble(6)))
      val dedup = memb.map { case (b, i) => (b.toLong, s"i$i") }.distinct
      val supp = dedup.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val n = dedup.map(_._1).distinct.size.toLong
      rules.forall { case (a, c, ps, sa, sc, conf, lift) =>
        val byBasket = dedup.groupBy(_._1)
        val truePair = byBasket.values.count(rows =>
          rows.exists(_._2 == a) && rows.exists(_._2 == c))
        sa == supp(a) && sc == supp(c) &&
          ps == truePair && ps >= 1 && ps <= math.min(sa, sc) &&
          conf > 0.0 && conf <= 1.0 &&
          conf == ps.toDouble / sa.toDouble &&
          lift == (ps * n).toDouble / (sa * sc).toDouble
      } && {
        // lift is direction-symmetric; both directions always co-emitted
        val m = rules.map(r => (r._1, r._2) -> r._7).toMap
        m.forall { case ((a, c), l) => m.get((c, a)).contains(l) }
      }
    })
  }

  test("snapshotDiff partitions the key universe: counts reconcile with " +
      "both inputs for random edit sets") {
    val genRows: Gen[List[(Int, Int)]] = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(1, 40), Gen.choose(0, 5)))
    check(Prop.forAll(genRows, genRows) { (aRaw, bRaw) =>
      // dedup keys (snapshotDiff's contract is keyed versions)
      val a = aRaw.toMap.toSeq.toDF("id", "v")
      val b = bRaw.toMap.toSeq.toDF("id", "v")
      val m = Validations.snapshotDiff(a, b, Seq("id"), Seq("v"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val (am, bm) = (aRaw.toMap, bRaw.toMap)
      m("added") == bm.keySet.diff(am.keySet).size &&
        m("removed") == am.keySet.diff(bm.keySet).size &&
        m("changed") + m("unchanged") == am.keySet.intersect(bm.keySet).size &&
        m("changed") == am.keySet.intersect(bm.keySet)
          .count(k => am(k) != bm(k)) &&
        m("col_changed:v") == m("changed") &&
        // totals reconcile with both inputs
        m("removed") + m("changed") + m("unchanged") == am.size &&
        m("added") + m("changed") + m("unchanged") == bm.size
    })
  }

  test("burstiness is bounded in [-1, 1) and -1 exactly iff gaps are " +
      "all equal (n >= 2)") {
    val genGaps: Gen[List[Int]] = Gen.choose(2, 8).flatMap(n =>
      Gen.listOfN(n, Gen.choose(1, 30)))
    check(Prop.forAll(genGaps) { gaps =>
      val times = gaps.scanLeft(0L)(_ + _)
      val rows = times.zipWithIndex.map { case (t, i) =>
        (1L, new Timestamp(1700000000000L + t * 1000L), i.toLong) }
      val df = rows.toDF("u", "ts", "id")
      val out = graft.x.EventAnalytics.burstiness(df, "u", "ts", "id")
        .collect()
      out.length == 1 && {
        val bv = out(0).getDouble(3)
        bv >= -1.0 && bv < 1.0 &&
          ((bv == -1.0) == (gaps.distinct.size == 1))
      }
    })
  }

  test("shortestPaths with enough rounds equals Dijkstra on random DAG-ish " +
      "graphs; more rounds never increase a distance") {
    val genEdges: Gen[List[(Int, Int, Int)]] = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(1, 8), Gen.choose(1, 8), Gen.choose(1, 9)))
    check(Prop.forAll(genEdges) { raw =>
      val es = raw.filter(e => e._1 != e._2)
      es.isEmpty || {
        val df = es.map(e => (e._1.toLong, e._2.toLong, e._3.toLong))
          .toDF("src", "dst", "w")
        val got = graft.x.Graph.shortestPaths(df, "src", "dst", "w",
            sources = Seq(1L), rounds = 8)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // reference: driver-side Bellman-Ford to fixpoint
        val best = scala.collection.mutable.Map(1L -> 0L)
        val em = es.map(e => (e._1.toLong, e._2.toLong,
          e._3.toLong)).groupBy(identity).keys.toSeq
        var changed = true
        while (changed) {
          changed = false
          em.foreach { case (s, d, w) =>
            best.get(s).foreach { ds =>
              if (best.get(d).forall(_ > ds + w)) {
                best(d) = ds + w; changed = true
              }
            }
          }
        }
        got == best.toMap
      }
    })
  }

  // ---- exact-statistics tier vs brute-force references (r9 task 5) ----
  // These operators' entire value is the exactness contract: doubled
  // midranks stay integer, tie terms sum exactly, and the one IEEE chain
  // at the end is fixed-shape. Each property replays the textbook
  // definition on the driver and compares.

  private val genTwoSamples: Gen[(List[Int], List[Int])] = Gen.zip(
    Gen.nonEmptyListOf(Gen.choose(0, 8)).map(_.take(25)),
    Gen.nonEmptyListOf(Gen.choose(0, 8)).map(_.take(25)))

  test("mannWhitneyU matches the brute-force midrank/tie-corrected reference") {
    check(Prop.forAll(genTwoSamples) { case (as, bs) =>
      val df = (as.map(v => ("a", v)) ++ bs.map(v => ("b", v))).toDF("g", "v")
      val row = graft.x.Profiler.mannWhitneyU(df, "v", "g", "a", "b")
        .collect().head
      val na = as.size; val nb = bs.size; val n = na + nb
      val all = as ++ bs
      // doubled midrank stays integer: 2r(v) = 2·|{u < v}| + c(v) + 1
      def rank2(v: Int): Long = 2L * all.count(_ < v) + all.count(_ == v) + 1
      val twoRa = as.map(rank2).sum
      val ua = (twoRa - na.toLong * (na + 1)) / 2.0
      val tieSum = all.distinct.map { v =>
        val c = all.count(_ == v).toLong; c * c * c - c
      }.sum
      val corr = (n + 1.0) - tieSum.toDouble / (n.toDouble * (n - 1.0))
      val zb = if (na > 0 && nb > 0 && corr > 0)
        Some((ua - na.toDouble * nb / 2.0) /
          math.sqrt(na.toDouble * nb / 12.0 * corr))
      else None
      val rb = 2.0 * ua / (na.toDouble * nb) - 1.0
      val okZ = (zb, Option(row.get(3))) match {
        case (Some(z), Some(got)) =>
          math.abs(got.asInstanceOf[Double] - z) < 2e-6
        case (None, None) => true
        case _ => false
      }
      row.getLong(0) == na && row.getLong(1) == nb &&
        math.abs(row.getDouble(2) - ua) < 1e-9 && okZ &&
        math.abs(row.getDouble(4) - rb) < 2e-6
    })
  }

  test("ksTest d_num and ks_at match an exact brute-force CDF scan") {
    check(Prop.forAll(genTwoSamples) { case (as, bs) =>
      val df = (as.map(v => ("a", v)) ++ bs.map(v => ("b", v))).toDF("g", "v")
      val row = graft.x.Profiler.ksTest(df, "v", "g", "a", "b")
        .collect().head
      val na = as.size.toLong; val nb = bs.size.toLong
      val scans = (as ++ bs).distinct.sorted.map { v =>
        (v, math.abs(as.count(_ <= v) * nb - bs.count(_ <= v) * na))
      }
      val dnum = scans.map(_._2).max
      // the op's max_by(__v, struct(__num, -__v)) picks the SMALLEST
      // attaining value — same tiebreak here
      val ksAt = scans.filter(_._2 == dnum).map(_._1).min
      row.getLong(0) == na && row.getLong(1) == nb &&
        row.getLong(2) == dnum && row.getInt(3) == ksAt &&
        math.abs(row.getDouble(4) - dnum.toDouble / (na * nb)) < 1e-6
    })
  }

  test("spearman matches brute-force Pearson over midranks (ties included)") {
    val genPairs: Gen[List[(Int, Int)]] = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0, 6), Gen.choose(0, 6))).map(_.take(30))
    check(Prop.forAll(genPairs) { pairs =>
      val df = pairs.toDF("x", "y")
      val row = graft.x.Profiler.spearman(df, "x", "y").collect().head
      val n = pairs.size
      def midranks(v: List[Int]): List[Double] =
        v.map(x => v.count(_ < x) + (v.count(_ == x) + 1) / 2.0)
      val rx = midranks(pairs.map(_._1)); val ry = midranks(pairs.map(_._2))
      val mx = rx.sum / n; val my = ry.sum / n
      val cov = rx.zip(ry).map { case (a, b) => (a - mx) * (b - my) }.sum
      val vx = rx.map(a => (a - mx) * (a - mx)).sum
      val vy = ry.map(b => (b - my) * (b - my)).sum
      val rhoB = if (vx > 0 && vy > 0) Some(cov / math.sqrt(vx * vy)) else None
      val okRho = (rhoB, Option(row.get(1))) match {
        case (Some(r0), Some(got)) =>
          math.abs(got.asInstanceOf[Double] - r0) < 2e-6
        case (None, None) => true // constant column: rho undefined -> NULL
        case _ => false
      }
      row.getLong(0) == n && okRho
    })
  }

  test("passJoinPairs is LOSSLESS vs brute-force banded levenshtein " +
    "(random lengths incl. the short-string fallback, ties, blocks)") {
    // small alphabet forces near-misses; lengths 0..12 cross the
    // fallback boundary (l <= 2d) and the segment path repeatedly
    val genDoc: Gen[String] = Gen.choose(0, 12)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val genCase: Gen[(List[(String, String)], Int)] = Gen.zip(
      Gen.nonEmptyListOf(Gen.zip(genDoc, Gen.oneOf("u", "v"))).map(_.take(14)),
      Gen.choose(1, 3))
    def lev(a: String, b: String): Int = {
      val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
          m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      m(a.length)(b.length)
    }
    check(Prop.forAll(genCase) { case (docs, d) =>
      val rows = docs.zipWithIndex.map { case ((t, blk), i) => (i.toLong, t, blk) }
      val df = rows.toDF("doc_id", "text", "blk")
      val got = graft.x.Dedup
        .passJoinPairs(df, "text", "doc_id", "blk", maxDist = d)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
      val want = (for {
        (a, ia) <- rows.map(r => (r, r._1))
        (b, ib) <- rows.map(r => (r, r._1))
        if ia < ib && a._3 == b._3
        dist = lev(a._2, b._2)
        if dist <= d
      } yield (ia, ib) -> dist).toMap
      got == want
    })
  }

  test("cohensKappa matches the textbook contingency formula on random raters") {
    val genPairs = Gen.nonEmptyListOf(
      Gen.zip(Gen.oneOf("x", "y", "z"), Gen.oneOf("x", "y", "z"))).map(_.take(60))
    check(Prop.forAll(genPairs) { pairs =>
      val got = graft.x.Profiler.cohensKappa(
        pairs.toDF("a", "b"), "a", "b").head()
      val n = pairs.size.toDouble
      val agree = pairs.count { case (a, b) => a == b }.toDouble
      val cats = (pairs.map(_._1) ++ pairs.map(_._2)).distinct
      val pe = cats.map(c => (pairs.count(_._1 == c).toDouble / n) *
        (pairs.count(_._2 == c).toDouble / n)).sum
      val po = agree / n
      val kOk =
        if (math.abs(pe - 1.0) < 1e-12) got.isNullAt(4)
        else math.abs(got.getDouble(4) - (po - pe) / (1.0 - pe)) < 1e-5
      got.getLong(0) == pairs.size && got.getLong(1) == agree.toLong &&
        math.abs(got.getDouble(2) - po) < 1e-6 && kOk
    })
  }

  test("tokenJsDivergence matches a driver-side reference on random corpora") {
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee")
    val doc = Gen.nonEmptyListOf(word).map(_.take(8).mkString(" "))
    val corpus = Gen.nonEmptyListOf(doc).map(_.take(5))
    check(Prop.forAll(Gen.zip(corpus, corpus)) { case (ca, cb) =>
      def freqs(c: List[String]) = c.flatMap(_.split("\\s+")).filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val (fa, fb) = (freqs(ca), freqs(cb))
      val (na, nb) = (fa.values.sum.toDouble, fb.values.sum.toDouble)
      val js = (fa.keySet ++ fb.keySet).toSeq.map { t =>
        val p = fa.getOrElse(t, 0L) / na
        val q = fb.getOrElse(t, 0L) / nb
        val m = (p + q) / 2.0
        (if (p > 0) p * math.log(p / m) else 0.0) +
          (if (q > 0) q * math.log(q / m) else 0.0)
      }.sum / 2.0
      val got = graft.x.TextAnalysis.tokenJsDivergence(
        ca.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
        cb.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
        "text").head()
      math.abs(got.getDouble(5) - js) < 1e-5 &&
        got.getDouble(5) >= 0.0 && got.getDouble(5) <= math.log(2.0) + 1e-9
    })
  }

  test("calibrationBins ECE matches the share-weighted driver reference") {
    val pt = Gen.zip(Gen.choose(0, 100).map(_ / 100.0), Gen.oneOf(true, false))
    val data = Gen.nonEmptyListOf(pt).map(_.take(50))
    check(Prop.forAll(data) { pts =>
      val rows = graft.x.Profiler.calibrationBins(
        pts.toDF("s", "y"), "s", "y", nBins = 10).collect()
      val byBin = pts.groupBy { case (s, _) =>
        math.min(math.max(math.floor(s * 10.0), 0.0), 9.0).toLong }
      val n = pts.size.toDouble
      val ece = byBin.map { case (_, g) =>
        val mp = g.map(_._1).sum / g.size
        val fp = g.count(_._2).toDouble / g.size
        (g.size / n) * math.abs(mp - fp)
      }.sum
      rows.length == byBin.size &&
        rows.forall(r => math.abs(r.getDouble(7) - ece) < 1e-4) &&
        rows.forall { r =>
          val g = byBin(r.getLong(0))
          r.getLong(1) == g.size &&
            math.abs(r.getDouble(4) - g.map(_._1).sum / g.size) < 1e-4
        }
    })
  }

  test("zipfFit equals a driver-side OLS over the exact log points") {
    val word = Gen.oneOf((1 to 12).map(i => s"w$i"))
    val corpus = Gen.nonEmptyListOf(word).map(_.take(200))
    check(Prop.forAll(corpus) { words =>
      val got = graft.x.TextAnalysis.zipfFit(
        Seq((1L, words.mkString(" "))).toDF("doc_id", "text"), "text").head()
      val freq = words.groupBy(identity).view.mapValues(_.size).toSeq
        .sortBy { case (t, c) => (-c, t) }
      val pts = freq.zipWithIndex.map { case ((_, c), i) =>
        (math.log((i + 1).toDouble), math.log(c.toDouble)) }
      val n = pts.size.toDouble
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val den = n * sxx - sx * sx
      got.getLong(0) == pts.size && (
        if (math.abs(den) < 1e-12) got.isNullAt(1)
        else math.abs(got.getDouble(1) - (n * sxy - sx * sy) / den) < 1e-4)
    })
  }
}
