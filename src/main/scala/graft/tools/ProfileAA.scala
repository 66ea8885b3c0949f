package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-level profiler for adamicAdar (dev only): times each
  * pipeline stage of the x187 shape in isolation so the PLANS.md budget
  * entry records a measured breakdown, not a guess. */
object ProfileAA {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    li.count()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey")
    val eIn = li.select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
      .withColumn("dst", lead("l_partkey", 1).over(w))
      .filter(col("dst").isNotNull)
      .select(col("l_partkey").as("src"), col("dst"))
    val e = t("canonicalEdges+stage")(
      eIn.filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .distinct().localCheckpoint(true))
    val adj = e.select(col("a").as("w"), col("b").as("n"))
      .unionAll(e.select(col("b").as("w"), col("a").as("n")))
    val kept = adj.join(
      adj.groupBy("w").agg(count(lit(1)).as("__deg"))
        .filter(col("__deg").between(2, 1000)).select("w"), "w")
    val adjList = kept.groupBy("w")
      .agg(sort_array(collect_list(col("n"))).as("__ns"))
    t("adjList count")(adjList.count())
    val adjListC = adjList.localCheckpoint(true)
    val wedges = adjListC
      .select(col("__ns"),
        ((lit(1.0) / log(size(col("__ns")).cast("double")))
          .cast("decimal(18,8)") * lit(100000000L)).cast("long").as("__t"),
        explode(expr("sequence(1, size(__ns) - 1)")).as("__i"))
      .select(col("__t"),
        expr("element_at(__ns, __i)").as("a"),
        explode(expr("slice(__ns, __i + 1, size(__ns) - __i)")).as("b"))
    t("wedge generate only (count)")(wedges.count())
    t("wedge generate only (count) x2")(wedges.count())
    val agg = wedges.groupBy("a", "b")
      .agg(sum("__t").as("__aa"), count(lit(1)).cast("long").as("common"))
    t("wedges + (a,b) agg")(agg.count())
    t("wedges + (a,b) agg x2")(agg.count())
    // variant experiments for the agg bottleneck
    t("shuffle only (repartition a,b)")(
      wedges.repartition(32, col("a"), col("b")).count())
    val packed = wedges.select(
      (col("a") * lit(4294967296L) + col("b")).as("ab"), col("__t"))
      .groupBy("ab")
      .agg(sum("__t").as("__aa"), count(lit(1)).cast("long").as("common"))
    t("packed-key agg")(packed.count())
    t("packed-key agg x2")(packed.count())
    val topPacked = packed
      .orderBy(col("__aa").desc, col("ab")).limit(300)
    t("packed agg + top300 (pre-anti)")(topPacked.collect().length)
    t("packed agg + top300 x2")(topPacked.collect().length)
    spark.conf.set("spark.sql.shuffle.partitions", "128")
    val agg128 = wedges.groupBy("a", "b")
      .agg(sum("__t").as("__aa"), count(lit(1)).cast("long").as("common"))
    t("agg @128 partitions")(agg128.count())
    t("agg @128 partitions x2")(agg128.count())
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.set("spark.sql.codegen.aggregate.map.twolevel.enabled", "false")
    t("agg twolevel off")(wedges.groupBy("a", "b")
      .agg(sum("__t").as("__aa"), count(lit(1)).as("common")).count())
    spark.conf.set("spark.sql.codegen.aggregate.map.twolevel.enabled", "true")
    val preSorted = wedges.sortWithinPartitions("a", "b").groupBy("a", "b")
      .agg(sum("__t").as("__aa"), count(lit(1)).as("common"))
    t("agg pre-sortWithinPartitions")(preSorted.count())
    // r12 (VERDICT r11 #6): degree-bucketed two-level partial agg — split
    // the wedge stream by center-list size (small-center wedges rarely
    // share (a,b) with each other; big-center wedges are where repeats
    // live), aggregate each bucket with its own (smaller) hash map, then
    // merge the two pre-aggregated streams with a second (a,b) agg. Tests
    // whether two tighter hash maps + a smaller merge beat one 19.7M-group
    // map. Exact by construction (sum/count are associative).
    val wedgesB = adjListC
      .select(col("__ns"), (size(col("__ns")) >= 16).as("__big"),
        ((lit(1.0) / log(size(col("__ns")).cast("double")))
          .cast("decimal(18,8)") * lit(100000000L)).cast("long").as("__t"),
        explode(expr("sequence(1, size(__ns) - 1)")).as("__i"))
      .select(col("__big"), col("__t"),
        expr("element_at(__ns, __i)").as("a"),
        explode(expr("slice(__ns, __i + 1, size(__ns) - __i)")).as("b"))
    def bucketAgg(big: Boolean) = wedgesB.filter(col("__big") === big)
      .groupBy("a", "b")
      .agg(sum("__t").as("__aa"), count(lit(1)).cast("long").as("common"))
    val bucketed = bucketAgg(true).unionAll(bucketAgg(false))
      .groupBy("a", "b")
      .agg(sum("__aa").as("__aa"), sum("common").as("common"))
    t("degree-bucketed two-level agg")(bucketed.count())
    t("degree-bucketed two-level agg x2")(bucketed.count())
    val fin = agg.join(e, Seq("a", "b"), "left_anti")
      .select(col("a"), col("b"), col("common"),
        (col("__aa").cast("double") / lit(1e8)).as("aa"))
      .orderBy(col("aa").desc, col("a"), col("b"))
      .limit(100)
    t("full tail (anti+top100)")(fin.collect().length)
    t("full tail x2")(fin.collect().length)
    spark.stop()
  }
}
