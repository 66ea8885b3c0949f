package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.x.Dedup

/** Sorted-neighborhood linkage + prefix-filtered similarity join: the
  * distributed rank must agree with the single-partition reference, and
  * the prefix filter must be LOSSLESS against the uncapped all-pairs
  * join — both ops' scale story only counts if the cheap plan computes
  * the identical relation. */
class LinkageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("globalRowNumber matches the single-partition window reference") {
    val df = spark.range(0, 997).select(
      (col("id") * 37 % 997).as("id"),          // scrambled insertion order
      concat(lit("k"), lpad((col("id") % 13).cast("string"), 3, "0")).as("k"))
      .repartition(7)                            // multi-partition input
    val got = Dedup.globalRowNumber(df, Seq(col("k"), col("id")))
      .select("id", "rank")
    val ref = df.withColumn("rank",
      row_number().over(Window.orderBy("k", "id")).cast("long"))
      .select("id", "rank")
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
  }

  test("sortedNeighborhoodPairs links typo variants equality blocking separates") {
    val df = Seq(
      (1L, "acme corp"),
      (2L, "acme corpX"),   // trailing corruption: sorts adjacent, dist 1
      (3L, "acne corp"),    // one substitution: adjacent in sort, dist 1
      (4L, "zenith ltd"),   // far away in sort order
      (5L, "completely different name")).toDF("id", "name")
    val pairs = Dedup.sortedNeighborhoodPairs(df, "name", "id",
      window = 3, maxDist = 1).collect()
    val got = pairs.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // sort order: acme corp, acme corpX, acne corp, completely…, zenith…;
    // (2,3) is distance 2 (substitution + trailing delete) and is filtered
    assert(got == Set((1L, 2L, 1L), (1L, 3L, 1L)))
  }

  test("sortedNeighborhoodPairs window spans range-partition boundaries") {
    // many rows force multiple range partitions; the dense-rank join must
    // still produce every (r, r+1) neighbor — a per-partition window
    // implementation would silently drop the boundary pairs
    val df = spark.range(0, 500).select(col("id"),
      lpad(col("id").cast("string"), 5, "0").as("k"))
    val pairs = Dedup.sortedNeighborhoodPairs(df, "k", "id",
      window = 2, maxDist = 5)
    assert(pairs.count() == 499)
  }

  test("lengthBatches groups similar lengths and beats shuffled batching on waste") {
    val docs = spark.range(0, 256).select(col("id"),
      (pmod(col("id") * 37, lit(97)) + 1).as("len"))
    val batches = graft.x.Sampling.lengthBatches(docs, "len", "id", batchSize = 32)
    // partition: every doc in exactly one batch, batches full
    assert(batches.count() == 256)
    assert(batches.select("batch_id").distinct().count() == 8)
    val waste = batches.groupBy("batch_id")
      .agg((count(lit(1)) * max("len") - sum("len")).as("w"))
      .agg(sum("w")).collect()(0).getLong(0)
    // shuffled reference: batch by id order instead of length order
    val shuffled = docs.withColumn("batch_id", expr("id div 32"))
      .groupBy("batch_id")
      .agg((count(lit(1)) * max("len") - sum("len")).as("w"))
      .agg(sum("w")).collect()(0).getLong(0)
    assert(waste < shuffled / 4,
      s"length grouping should collapse padding waste ($waste vs $shuffled)")
  }

  test("prefixFilterPairs is lossless vs the uncapped all-pairs join") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i k"),      // near-dup of 1
      (3L, "a b c d e f g h i j"),      // exact dup of 1
      (4L, "z y x w v u t s r q"),
      (5L, "z y x w v u t s r p"),      // near-dup of 4
      (6L, "m n o p q r unrelated doc entirely")).toDF("doc_id", "text")
    val pf = Dedup.prefixFilterPairs(docs, "text", "doc_id", n = 3,
      threshold = 0.5)
    val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id", n = 3,
      threshold = 0.5, maxDocFreq = Int.MaxValue)
    assert(pf.exceptAll(exact).isEmpty && exact.exceptAll(pf).isEmpty)
    assert(pf.count() > 0)
  }
}
