package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.aggregate.Partial
import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.functions.TopKAgg

/** TopKAgg: the bounded-heap per-group top-k aggregate. Contract:
  * identical rows to the `row_number()` window formulation (same
  * (ord DESC, item ASC) rank), under any partitioning; and the partial
  * aggregate must sit BELOW the exchange — shipping ≤ k entries per
  * (map task × group) without the sorts WindowGroupLimit needs is the
  * operator's reason to exist. */
class TopKAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("top_k_by equals the window formulation (long items, ties, any partitioning)") {
    import spark.implicits._
    // deterministic pseudo-random frame with heavy ord ties to exercise
    // the item tie-break, spread over 8 partitions
    val rows = (0 until 4000).map { i =>
      val g = s"g${i % 7}"
      val ord = (i * 2654435761L % 97) / 10.0 // many collisions
      (g, ord, i.toLong)
    }
    val df = rows.toDF("g", "v", "id").repartition(8)

    val viaAgg = df.groupBy($"g")
      .agg(TopKAgg.topKBy($"v", $"id", 5).as("tk"))
      .select($"g", explode($"tk").as("e"))
      .select($"g", $"e.ord".as("v"), $"e.item".as("id"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"v".desc, $"id")
    val viaWindow = df
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
      .select($"g", $"v", $"id")

    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty)
    // groups smaller than k return the whole group
    val small = Seq(("a", 1.0, 1L), ("a", 2.0, 2L)).toDF("g", "v", "id")
      .groupBy($"g").agg(TopKAgg.topKBy($"v", $"id", 10).as("tk"))
      .select(size($"tk")).head().getInt(0)
    assert(small == 2)
  }

  test("top_k_by carries string items and skips null ord/item rows") {
    import spark.implicits._
    val df = Seq(
      ("g1", Some(3.0), Some("carol")), ("g1", Some(3.0), Some("alice")),
      ("g1", Some(9.0), Some("bob")), ("g1", Some(1.0), Some("dave")),
      ("g1", None, Some("ghost")), ("g1", Some(8.0), None)
    ).toDF("g", "v", "name").repartition(4)
    val got = df.groupBy($"g")
      .agg(TopKAgg.topKBy($"v", $"name", 3).as("tk"))
      .select(explode($"tk").as("e"))
      .select($"e.ord", $"e.item")
      .collect().map(r => (r.getDouble(0), r.getString(1))).toSeq
    // best-first, tie on v=3.0 broken by name ASC; null rows ignored
    assert(got == Seq((9.0, "bob"), (3.0, "alice"), (3.0, "carol")))
  }

  test("partial top_k_by aggregates BELOW the shuffle exchange") {
    import spark.implicits._
    val df = (0 until 100).map(i => (s"g${i % 4}", i.toDouble, i.toLong))
      .toDF("g", "v", "id")
    // exchanges are inserted by EnsureRequirements (executedPlan), and AQE
    // wraps them out of sight — assert on the non-adaptive physical plan
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val agged = df.groupBy($"g").agg(TopKAgg.topKBy($"v", $"id", 3).as("tk"))
      val plan = agged.queryExecution.executedPlan
      val partialBelowShuffle = plan.collect {
        case s: ShuffleExchangeExec if s.child.collectFirst {
          case a: ObjectHashAggregateExec
            if a.aggregateExpressions.exists(_.mode == Partial) => a
        }.isDefined => s
      }
      assert(partialBelowShuffle.nonEmpty,
        s"expected a Partial top_k_by under the exchange:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
