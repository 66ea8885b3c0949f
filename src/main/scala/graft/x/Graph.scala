package graft.x

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.util.Staging

/** Iterative graph analytics over plain edge DataFrames.
  *
  * The curation use case (ref: the web-hygiene stage of
  * `dags/transform/spark.json`-style pipelines, generalized): link-graph
  * importance scores are a standard quality/weighting signal for crawl
  * corpora, and co-occurrence graphs (items in a session, parts in an
  * order) yield popularity ranks for retrieval and sampling weights.
  */
object Graph {

  /** Damped PageRank (Page et al. 1999) in exact integer "nano-rank"
    * arithmetic.
    *
    * Every quantity is a scaled BIGINT (`scale` ≙ rank mass 1.0): the
    * per-edge contribution is `rank div outdeg`, the dangling mass is
    * redistributed as `dangling div n`, and the update is
    * `new = ((100-damp)·base + damp·(incoming + dangling div n)) div 100`
    * — floor divisions over non-negative integers and BIGINT sums, which
    * ARE associative where double sums are not. So the final ranks are
    * bit-identical under any partitioning, any aggregation order, and any
    * engine — the [[Sampling.weightedSample]] exact-integer discipline
    * applied to an iterative fixpoint. (The div-flooring leaks ≤1 nano
    * per node per round out of the total mass; that loss is itself
    * deterministic.)
    *
    * Scale shape: `edges`/`nodes`/`outdeg` are staged once and re-read
    * every round, never recomputed. Each iteration is ONE src-keyed
    * equi-join of ranks to edges (the same key every round — a cluster
    * deployment would bucket edges by src once and never reshuffle
    * them), one dst-keyed partial+final SUM, and one scalar dangling
    * aggregate; ranks re-stage per round to cut lineage. Nothing larger
    * than one scalar per round reaches the driver — same job shape as
    * [[Similarity.kmeansStep]] loops.
    */
  def pageRank(edgesIn: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 5, dampNum: Long = 85L, scale: Long = 1000000000L,
      staging: Staging = Staging.LocalCheckpoint): DataFrame = {
    require(iters >= 1, s"pageRank needs iters >= 1, got $iters")
    require(dampNum >= 0 && dampNum <= 100, s"dampNum is a percentage, got $dampNum")
    val edges = staging.stage(
      edgesIn.filter(col(srcCol) =!= col(dstCol))
        .select(col(srcCol).cast("long").as("src"),
          col(dstCol).cast("long").as("dst"))
        .distinct(), "pr-edges")
    val nodes = staging.stage(
      edges.select(col("src").as("node"))
        .union(edges.select(col("dst").as("node"))).distinct(), "pr-nodes")
    val outdeg = staging.stage(
      edges.groupBy("src").agg(count(lit(1)).as("__od")), "pr-outdeg")
    val n = nodes.count()
    require(n > 0, "pageRank needs a non-empty graph")
    val base = scale / n
    var ranks = nodes.withColumn("rank_nano", lit(base))
    for (i <- 1 to iters) {
      val dangling = ranks
        .join(outdeg, ranks("node") === outdeg("src"), "left_anti")
        .agg(coalesce(sum("rank_nano"), lit(0L))).head.getLong(0)
      val incoming = edges
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst").as("node"), expr("rank_nano div __od").as("__c"))
        .groupBy("node").agg(sum("__c").as("__in"))
      ranks = staging.stage(
        nodes.join(incoming, Seq("node"), "left")
          .select(col("node"), expr(
            s"(${(100L - dampNum) * base} + $dampNum * " +
              s"(coalesce(__in, 0L) + ${dangling / n})) div 100")
            .as("rank_nano")),
        s"pr-ranks-$i")
    }
    ranks
  }
}
