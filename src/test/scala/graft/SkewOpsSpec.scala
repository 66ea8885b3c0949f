package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SkewOps

class SkewOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  val sf = TestSpark.sfDir

  test("saltedJoin equals the plain join on a skewed key distribution") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_suppkey", "l_quantity")
    val supp = spark.read.parquet(s"$sf/supplier.parquet")
      .select("s_suppkey", "s_name").withColumnRenamed("s_suppkey", "l_suppkey")
    val plain = li.join(supp, Seq("l_suppkey"))
    val salted = SkewOps.saltedJoin(li, supp, Seq("l_suppkey"), saltFactor = 8)
    assert(salted.count() == plain.count())
    assert(salted.select(supp.columns.head).distinct().count() ==
      plain.select(supp.columns.head).distinct().count())
    assert(salted.columns.sorted.sameElements(plain.columns.sorted))
    // row-level equality, order-independent
    assert(plain.exceptAll(salted.select(plain.columns.map(col): _*)).isEmpty)
  }

  test("saltedAgg equals the plain aggregation") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val plain = li.groupBy("l_returnflag") // 3 hot keys over 6000 rows — maximal skew
      .agg(sum($"l_quantity").as("qty"), count(lit(1)).as("n"),
        min($"l_extendedprice").as("lo"), max($"l_extendedprice").as("hi"))
    val salted = SkewOps.saltedAgg(li, Seq("l_returnflag"), saltFactor = 8, Seq(
      "qty" -> SkewOps.sumOf($"l_quantity"),
      "n" -> SkewOps.countAll,
      "lo" -> SkewOps.minOf($"l_extendedprice"),
      "hi" -> SkewOps.maxOf($"l_extendedprice")))
    val p = plain.orderBy("l_returnflag").collect()
    val s = salted.orderBy("l_returnflag").collect()
    assert(p.length == s.length)
    p.zip(s).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      assert(math.abs(a.getDouble(1) - b.getDouble(1)) < 1e-6)
      assert(a.getLong(2) == b.getLong(2))
      assert(a.getDouble(3) == b.getDouble(3) && a.getDouble(4) == b.getDouble(4))
    }
  }
}
