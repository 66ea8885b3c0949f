package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import org.apache.spark.sql.functions.col
import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("IntervalJoin.overlap: result-equal to the naive join, duplicate-free, no nested loop") {
    import graft.operators.IntervalJoin
    val rnd = new scala.util.Random(7)
    // adversarial mix: tiny intervals, bin-straddling ones, ones spanning
    // many bins, empty ones, and shared boundaries (half-open semantics)
    val left = (1 to 300).map { i =>
      val s = rnd.nextInt(1000).toLong
      (i.toLong, s, s + Seq(0L, 1L, 7L, 40L, 200L)(rnd.nextInt(5)))
    }.toDF("l_id", "ls", "le")
    val right = (1 to 300).map { i =>
      val s = rnd.nextInt(1000).toLong
      (i.toLong, s, s + Seq(0L, 1L, 10L, 64L)(rnd.nextInt(4)))
    }.toDF("r_id", "rs", "re")
    val binned = IntervalJoin.overlap(left, right, "ls", "le", "rs", "re", binSize = 16)
      .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // the bare ls<re && rs<le predicate spuriously matches EMPTY intervals
    // (e.g. [5,5) "overlaps" [3,8)); half-open semantics say they contain
    // no points, so the honest naive reference excludes them too
    val naive = left.filter(col("le") > col("ls"))
      .join(right.filter(col("re") > col("rs")),
        col("ls") < col("re") && col("rs") < col("le"))
      .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(binned.length == binned.distinct.length, "first-shared-bin dedup must hold")
    assert(binned.toSet == naive.toSet,
      s"binned join must equal naive (binned=${binned.length}, naive=${naive.length})")
    // the point of the rewrite: an equi-join plan, not a nested loop
    val plan = IntervalJoin.overlap(left, right, "ls", "le", "rs", "re", 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"binned plan must hash-join:\n$plan")
    val naivePlan = left.join(right, col("ls") < col("re") && col("rs") < col("le"))
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin") || naivePlan.contains("CartesianProduct"),
      "the naive formulation is the nested loop the rewrite exists to avoid")
  }

  test("attaches the latest right row at-or-before; null payloads never tear") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "p1"),
      (1L, ts("2024-01-01 12:00:00"), "p2"),
      (2L, ts("2024-01-01 09:00:00"), "p3") // before any right row
    ).toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), Option(5L), Option(3.0)),
      // the LATEST right row before p2 has a NULL value — a torn join would
      // return (6, 3.0), stitching columns from different rows
      (1L, ts("2024-01-01 11:00:00"), Option(6L), Option.empty[Double]),
      (2L, ts("2024-01-01 10:00:00"), Option(7L), Option(9.0))
    ).toDF("user_id", "ts", "event_id", "value")

    val out = AsOfJoin.asOf(left, right, Seq("user_id"), "ts", Seq("event_id", "value"))
      .orderBy("user_id", "ts").collect()
    assert(out.length == 3)
    // p1: latest right at-or-before 10:00 is (5, 3.0)
    assert(out(0).getAs[Long]("right_event_id") == 5L && out(0).getAs[Double]("right_value") == 3.0)
    // p2: latest right is (6, NULL) — value must be NULL, not 3.0
    assert(out(1).getAs[Long]("right_event_id") == 6L)
    assert(out(1).isNullAt(out(1).fieldIndex("right_value")))
    // p3: no right row yet → whole payload null
    assert(out(2).isNullAt(out(2).fieldIndex("right_event_id")))
  }

  test("right row at exactly the left timestamp is visible") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "p")).toDF("user_id", "ts", "tag")
    val right = Seq((1L, ts("2024-01-01 10:00:00"), 42L)).toDF("user_id", "ts", "event_id")
    val out = AsOfJoin.asOf(left, right, Seq("user_id"), "ts", Seq("event_id")).collect()
    assert(out(0).getAs[Long]("right_event_id") == 42L)
  }
}
