package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.config.SinkSpec
import graft.sinks.SinkWriter
import java.nio.file.Files

/** Bucketed-table output (SURVEY.md §4): both join sides written with the
  * same bucketing join without a shuffle — the co-location strategy that
  * replaces per-query repartitioning for hot join keys at scale. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sfDir

  test("same-bucketed tables join with zero exchanges") {
    val base = Files.createTempDirectory("graft-buckets").toString
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
      .withColumnRenamed("l_orderkey", "o_orderkey")

    SinkWriter.write(spark, orders, SinkSpec("orders_b", format = "parquet",
      path = Some(s"$base/orders_b"), savemode = "overwrite",
      bucketBy = Seq("o_orderkey"), numBuckets = 8, sortBy = Seq("o_orderkey"),
      tableName = Some("orders_b")))
    SinkWriter.write(spark, lineitem, SinkSpec("lineitem_b", format = "parquet",
      path = Some(s"$base/lineitem_b"), savemode = "overwrite",
      bucketBy = Seq("o_orderkey"), numBuckets = 8, sortBy = Seq("o_orderkey"),
      tableName = Some("lineitem_b")))

    // disable broadcast so the join would otherwise need a full shuffle
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == lineitem.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
