package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.x.Similarity

/** Scratch stage-level profiler for x51_ivfpq_topk's FIRST-RUN cost (dev
  * only): times each pipeline stage's first execution in a fresh session
  * so the codegen/planning stall is attributed to a stage, not guessed. */
object ProfileX51 {
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
    graft.util.Fs.warmStorage(sfDir)
    // generic session warmup, mirroring Bench
    spark.range(1000000).selectExpr("sum(id)").collect()
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    t("emb count (scan warm)")(emb.count())
    val centroids = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("centroid_id"), col("embedding"))
    val cb = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("code"), col("embedding"))
    val queries = emb.filter(col("vec_id") >= 490 && col("vec_id") < 500)
      .select(col("vec_id").as("q_id"), col("embedding"))
    for (pass <- 1 to 2) {
      println(s"=== pass $pass ===")
      val layout = java.nio.file.Files
        .createTempDirectory("ivfpq_prof").resolve("codes_by_cell").toString
      val assigned = t("assignToCentroids")(
        Similarity.assignToCentroids(emb, centroids, "vec_id", "centroid_id",
          "embedding").select(col("vec_id"), col("cell")).localCheckpoint(true))
      val enc = t("pqEncode")(
        Similarity.pqEncode(emb, cb, "vec_id", "code", "embedding", 8, 8)
          .localCheckpoint(true))
      t("layout write")(
        graft.sinks.SinkWriter.write(spark, assigned.join(enc, Seq("vec_id")),
          graft.config.SinkSpec("ivfpq_layout", "simpleInsert", "parquet",
            Some(layout), savemode = "overwrite", partitionBy = Seq("cell"))))
      val res = t("probe (ivfPqTopKFromLayout)")(
        Similarity.ivfPqTopKFromLayout(spark, layout, queries, centroids, cb,
          "vec_id", "q_id", "centroid_id", "code", "embedding",
          subspaces = 8, subDim = 8, k = 10, nprobe = 3).count())
      println(s"[prof] probe rows: $res")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
