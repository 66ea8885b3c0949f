package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.x.{Curation, Spatial, TextAnalysis}

/** Golden-record survivorship, integer-grid spatial join, Gopher rules. */
class SurvivorshipSpatialSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dbscan: two blobs cluster separately, border takes min core, noise isolated") {
    // blob A: unit square at origin (ids 1-4), blob B: square at (10,10)
    // (ids 11-14); id 21 touches A's corner only; id 99 far away.
    // radius=2, minPts=3: squares are all-core (3 neighbors each).
    val pts = Seq(
      (1L, 0L, 0L), (2L, 1L, 0L), (3L, 0L, 1L), (4L, 1L, 1L),
      (11L, 10L, 10L), (12L, 11L, 10L), (13L, 10L, 11L), (14L, 11L, 11L),
      (21L, 3L, 1L), (99L, 100L, 100L)).toDF("id", "x", "y")
    val out = graft.x.Spatial.dbscan(pts, "id", "x", "y", radius = 2, minPts = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(4), if (r.isNullAt(5)) -1L else r.getLong(5)))).toMap
    Seq(1L, 2L, 3L, 4L).foreach(i => assert(out(i) === (("core", 1L)), s"id $i"))
    Seq(11L, 12L, 13L, 14L).foreach(i => assert(out(i) === (("core", 11L)), s"id $i"))
    assert(out(21L) === (("border", 1L)), "corner point borders blob A")
    assert(out(99L) === (("noise", -1L)), "far point is unclustered noise")
    // layout invariance
    val again = graft.x.Spatial.dbscan(pts.repartition(7), "id", "x", "y",
      radius = 2, minPts = 3).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(4), if (r.isNullAt(5)) -1L else r.getLong(5)))).toMap
    assert(again === out)
  }

  test("goldenRecord: per-field priority, nulls never win, ties break by id") {
    val df = Seq(
      // cluster 1: high-prio record has null city → low-prio city survives
      (1L, 2, 10L, Some("Ann"), None: Option[String]),
      (1L, 1, 11L, Some("Anne"), Some("Berlin")),
      // cluster 2: two records at the same priority → higher id wins
      (2L, 1, 20L, Some("Bob"), Some("Paris")),
      (2L, 1, 21L, Some("Rob"), Some("Lyon")),
      // cluster 3: every value null in one field
      (3L, 5, 30L, None: Option[String], None: Option[String])).toDF(
      "cluster", "prio", "rid", "name", "city")
    val got = Curation.goldenRecord(df, "cluster", "prio", "rid",
      Seq("name", "city")).collect()
      .map(r => r.getLong(0) -> ((Option(r.getString(1)), Option(r.getString(2)))))
      .toMap
    assert(got(1L) == ((Some("Ann"), Some("Berlin"))))
    assert(got(2L) == ((Some("Rob"), Some("Lyon"))))
    assert(got(3L) == ((None, None)))
  }

  test("gridNeighborPairs matches brute force, including cell-boundary pairs") {
    val n = 400
    val pts = spark.range(0, n).select(col("id"),
      pmod(col("id") * 37, lit(97)).as("x"), pmod(col("id") * 61, lit(89)).as("y"))
    val r = 7L
    val got = Spatial.gridNeighborPairs(pts, "id", "x", "y", r)
    val a = pts.toDF("id_a", "xa", "ya")
    val b = pts.toDF("id_b", "xb", "yb")
    val ref = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("dist2", (col("xa") - col("xb")) * (col("xa") - col("xb")) +
        (col("ya") - col("yb")) * (col("ya") - col("yb")))
      .filter(col("dist2") <= r * r)
      .select("id_a", "id_b", "dist2")
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
    assert(got.count() > 0)
  }

  test("functionalDependencies: holds on a key, violations counted exactly") {
    val df = Seq(
      (1, "x", "p"), (1, "x", "p"),       // key 1 → one value: fine
      (2, "y", "p"), (2, "z", "p"),       // key 2 → two values: violation
      (3, null.asInstanceOf[String], "q") // null dependent ignored
    ).toDF("k", "v", "c")
    val got = graft.x.Profiler.functionalDependencies(df,
      Seq(("k", "v"), ("c", "k"))).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val kv = got(("k", "v"))
    assert(kv.getLong(2) == 3L && kv.getLong(3) == 1L && kv.getLong(4) == 1L
      && !kv.getBoolean(5))
    val ck = got(("c", "k"))   // p → {1,2}, q → {3}: one violating key
    assert(ck.getLong(3) == 1L && ck.getLong(4) == 1L && !ck.getBoolean(5))
  }

  test("gopherQualityFlags: each rule fires on its designed violation") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs to a barn " +
        "with seven other foxes in the misty morning light of autumn"),
      (2L, "short text only"),                           // wc_ok false
      (3L, ("a " * 25).trim),                            // mean word length 1
      (4L, "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18 19 20 21 22 23 24"),
      (5L, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do " +
        "eiusmod tempor incididunt ut labore et dolore magna aliqua")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherQualityFlags(docs, "text", "doc_id",
      minWords = 20, maxWords = 100).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Boolean]("pass"))
    assert(!got(2L).getAs[Boolean]("wc_ok"))
    assert(!got(3L).getAs[Boolean]("mwl_ok"))            // chars < 3·words
    assert(!got(4L).getAs[Boolean]("alpha_ok"))          // digits only
    assert(!got(4L).getAs[Boolean]("stop_ok"))
    assert(!got(5L).getAs[Boolean]("stop_ok"))           // latin, no stopwords
  }

  test("densityOutliers: isolated points flag, clustered points don't") {
    import spark.implicits._
    // 5 points in a tight cluster, 1 far away
    val pts = Seq((1L, 10L, 10L), (2L, 11L, 10L), (3L, 10L, 11L),
      (4L, 11L, 11L), (5L, 12L, 10L), (9L, 400L, 400L))
      .toDF("id", "x", "y")
    val got = graft.x.Spatial.densityOutliers(pts, "id", "x", "y",
        radius = 5, minPts = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getBoolean(4))).toMap
    assert(got(9L) == ((0L, true)), s"isolated point must flag: $got")
    (1L to 5L).foreach(id =>
      assert(got(id)._1 >= 4L && !got(id)._2, s"clustered $id flagged: $got"))
  }

  test("readabilityScores: monosyllabic prose reads easier than polysyllabic") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat. it was a big cat."),
      (2L, "extraordinary organizational methodologies necessitate considerable administrative deliberation."),
      (3L, "42 7 13")) // zero-vowel tokens: 1 syllable each, floor applies
      .toDF("doc_id", "text")
    val got = graft.x.TextAnalysis
      .readabilityScores(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Double]("flesch") > got(2L).getAs[Double]("flesch"))
    assert(got(1L).getAs[Double]("fk_grade") < got(2L).getAs[Double]("fk_grade"))
    assert(got(3L).getAs[Long]("n_syllables") == 3L &&
      got(3L).getAs[Long]("n_sentences") == 1L)
    assert(got(1L).getAs[Long]("n_sentences") == 2L)
  }
}
