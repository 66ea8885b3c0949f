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

  /** Deterministic fixed-size sample: the `n` rows with the smallest salted
    * hash — a reproducible stand-in for reservoir sampling (same marginal
    * uniformity, but re-runnable and mergeable: the global top-n of a
    * uniform hash is a TakeOrdered, no reservoir state, no shuffle of the
    * losers at 100 TB). */
  def deterministicReservoir(df: DataFrame, idCol: String, n: Int,
      salt: String = "reservoir"): DataFrame =
    df.withColumn("__hb", hashBucket(col(idCol), salt))
      .orderBy(col("__hb").asc, col(idCol).asc)
      .limit(n)
      .drop("__hb")
}
