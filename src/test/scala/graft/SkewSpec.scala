package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SkewJoin
import graft.x.Profiler
import graft.functions.PolyHash56

/** Skew diagnosis + salted-join contract: the mitigation must never change
  * the answer, and the diagnostic must be exact on a hand-checked frame. */
class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sfDir

  test("salted inner join returns exactly the plain join's rows") {
    val big = spark.read.parquet(s"$sf/lineitem.parquet")
    val small = spark.read.parquet(s"$sf/supplier.parquet")
      .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
    val salt = PolyHash56(concat(col("l_orderkey").cast("string"), lit(":"),
      col("l_linenumber").cast("string")))
    val saltedRows = SkewJoin.saltedInnerJoin(big, small, Seq("l_suppkey"), 8, salt)
      .select("l_orderkey", "l_linenumber", "l_suppkey", "s_nationkey")
    val plainRows = big.join(small, Seq("l_suppkey"))
      .select("l_orderkey", "l_linenumber", "l_suppkey", "s_nationkey")
    assert(saltedRows.exceptAll(plainRows).isEmpty &&
      plainRows.exceptAll(saltedRows).isEmpty)
    assert(saltedRows.count() == plainRows.count())
  }

  test("salting actually spreads a hot key over the salt space") {
    import spark.implicits._
    // one key carries 800 of 810 rows — the straggler shape
    val big = ((1 to 800).map(i => (1L, i.toLong)) ++
      (1 to 10).map(i => (2L, 1000L + i))).toDF("k", "id")
    val small = Seq((1L, "hot"), (2L, "cold")).toDF("k", "v")
    val shards = big.withColumn("__salt",
        pmod(PolyHash56(col("id").cast("string")), lit(8L)))
      .filter(col("k") === 1L)
      .groupBy("__salt").count().collect().map(_.getLong(1))
    assert(shards.length == 8, s"hot key hit only ${shards.length}/8 shards")
    assert(shards.max <= 800 / 8 * 2, s"worst shard ${shards.max} of 800")
    // and the join result still matches the plain join
    val salted = SkewJoin.saltedInnerJoin(big, small, Seq("k"), 8,
      PolyHash56(col("id").cast("string")))
    assert(salted.count() == 810)
  }

  test("merkleDiff: identical tables diff empty; edits localize to their leaves") {
    import graft.operators.Validations
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val key = concat(col("l_orderkey").cast("string"), lit("|"),
      col("l_linenumber").cast("string"))
    def row = concat(key, lit("|"),
      col("l_quantity").cast("decimal(18,2)").cast("string"))
    val base = Validations.merkleLeaves(li, key, row)
    assert(Validations.merkleDiff(base, base).count() == 0)
    // fixture (l_orderkey, l_linenumber) is NOT unique — pick a key pair
    // that identifies exactly one row so the edit provably lands
    val solo = li.groupBy("l_orderkey", "l_linenumber").count()
      .filter(col("count") === 1).orderBy("l_orderkey", "l_linenumber").head()
    val (ok, ln) = (solo.getLong(0), solo.getInt(1))
    val hit = col("l_orderkey") === ok && col("l_linenumber") === ln
    // one edited row → exactly one differing leaf, same counts both sides
    val edited = li.withColumn("l_quantity",
      when(hit, col("l_quantity") + 1.0).otherwise(col("l_quantity")))
    val diff = Validations.merkleDiff(base,
      Validations.merkleLeaves(edited, key, row)).collect()
    assert(diff.length == 1)
    assert(diff.head.getAs[Long]("a_cnt") == diff.head.getAs[Long]("b_cnt"))
    // a dropped row surfaces as a count mismatch in its leaf
    val dropDiff = Validations.merkleDiff(base,
      Validations.merkleLeaves(li.filter(!hit), key, row)).collect()
    assert(dropDiff.length == 1)
    assert(dropDiff.head.getAs[Long]("a_cnt") ==
      dropDiff.head.getAs[Long]("b_cnt") + 1)
  }

  test("keySkew is exact on a hand-checked frame") {
    import spark.implicits._
    // k: a×4, b×2, c,d,e,f ×1 → n=10, nd=6, mx=4,
    // hhi = (16+4+1+1+1+1)/100 = 0.24, skew_ratio = 4*6/10 = 2.4
    val df = (Seq.fill(4)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d", "e", "f"))
      .toDF("k")
    val r = Profiler.keySkew(df, Seq("k")).head()
    assert(r.getAs[Long]("n") == 10L)
    assert(r.getAs[Long]("n_distinct") == 6L)
    assert(r.getAs[String]("top_key") == "a")
    assert(r.getAs[Double]("top_share") == 0.4)
    assert(r.getAs[Double]("hhi") == 0.24)
    assert(r.getAs[Double]("skew_ratio") == 2.4)
  }
}
