package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.x.Graph

/** Scratch stage-level profiler for x202_partition_modularity (dev only):
  * times the LPA prelude and the modularity epilogue in isolation so the
  * PLANS.md budget decision (shave vs exception) records a measured
  * breakdown, not a guess. */
object ProfileX202 {
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
    li.count() // warm scan

    // Variant B: LPA with LAZY intermediate rounds — only the staged edge
    // layout and the FINAL labels materialize; rounds chain as one plan.
    def lpaLazy(edgesIn: org.apache.spark.sql.DataFrame, iters: Int) = {
      val directed = edgesIn.filter(col("src") =!= col("dst"))
        .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      val edges = directed.union(
          directed.select(col("dst").as("src"), col("src").as("dst")))
        .repartition(col("dst")).dropDuplicates("src", "dst")
        .sortWithinPartitions("dst").localCheckpoint(true)
      var labels = edges.select(col("src").as("node")).distinct()
        .withColumn("label", col("node"))
      for (i <- 1 to iters) {
        val counted = edges
          .join(labels.select(col("node").as("dst"), col("label")), Seq("dst"))
          .groupBy(col("src").as("node"), col("label"))
          .agg(count(lit(1)).as("__c"))
        labels = counted.groupBy("node")
          .agg(max(struct(col("__c").as("c"), (-col("label")).as("nl"))).as("m"))
          .select(col("node"), (-col("m.nl")).as("label"))
      }
      labels.localCheckpoint(true)
    }

    // Variant C: lazy rounds + the fused per-round agg — ONE mode() agg
    // (deterministic=true ties to the LOWEST label = LPA's tie-break)
    // replaces the (src,label)-count agg + struct-argmax pair, halving
    // the per-round exchanges.
    def lpaMode(edgesIn: org.apache.spark.sql.DataFrame, iters: Int) = {
      val directed = edgesIn.filter(col("src") =!= col("dst"))
        .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      val edges = directed.union(
          directed.select(col("dst").as("src"), col("src").as("dst")))
        .repartition(col("dst")).dropDuplicates("src", "dst")
        .sortWithinPartitions("dst").localCheckpoint(true)
      var labels = edges.select(col("src").as("node")).distinct()
        .withColumn("label", col("node"))
      for (i <- 1 to iters) {
        labels = edges
          .join(labels.select(col("node").as("dst"), col("label")), Seq("dst"))
          .groupBy(col("src").as("node"))
          .agg(mode(col("label"), deterministic = true).as("label"))
      }
      labels.localCheckpoint(true)
    }

    for (round <- 1 to 3) {
      println(s"=== pass $round ===")
      val edgesRaw = li.select(col("l_partkey").as("src"),
        (col("l_suppkey") + lit(1000000L)).as("dst")).distinct()
      val edges = t("distinct-edges stage")(edgesRaw.localCheckpoint(true))
      val labels = t("A staged/round lpa")(
        Graph.labelPropagation(edges, "src", "dst", iters = 3))
      t("A modularity")(Graph.modularity(edges, "src", "dst", labels).count())
      val labelsB = t("B lazy lpa")(lpaLazy(edges, 3))
      t("B modularity")(Graph.modularity(edges, "src", "dst", labelsB).count())
      val labelsC = t("C mode lpa")(lpaMode(edges, 3))
      t("C modularity")(Graph.modularity(edges, "src", "dst", labelsC).count())
      if (round == 1) {
        val a = labels.orderBy("node").collect().map(_.toSeq).toSeq
        val c = labelsC.orderBy("node").collect().map(_.toSeq).toSeq
        println(s"[prof] C == A labels: ${a == c} (${a.size} rows)")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
