package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

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
