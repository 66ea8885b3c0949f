package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.x.Dedup

/** Scratch stage-level profiler for the dedup pipeline (dev only). */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    // warm
    docs.count()
    val sh0 = Dedup.shingleHashes(docs, "text", "doc_id", 3)
    t("shingleHashes.count x1")(sh0.count())
    t("shingleHashes.count x2")(sh0.count())
    val sh = sh0
    t("hashed shingles")(sh.count())
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    t("sizes")(sizes.count())
    val inter = sh.select(col("doc_id").as("id_a"), col("__sh"))
      .join(sh.select(col("doc_id").as("id_b"), col("__sh")), Seq("__sh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    t("co-shingle join + pair agg")(inter.count())
    val shP = sh0.persist(); shP.count()
    t("signatures k=32")(Dedup.minhashSignatures(shP, "doc_id", 32).count())
    val sigs = Dedup.minhashSignatures(shP, "doc_id", 32)
    t("lsh candidates")(Dedup.lshCandidatePairs(sigs, "doc_id", 32, 8).count())
    val cands = Dedup.lshCandidatePairs(sigs, "doc_id", 32, 8).persist()
    t("cands persist")(cands.count())
    val candDocs = cands.select(col("id_a").as("doc_id"))
      .union(cands.select(col("id_b").as("doc_id"))).distinct()
    t("candDocs")(candDocs.count())
    val shc = shP.join(broadcast(candDocs), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("__sh"))
    t("shc semi-join")(shc.count())
    val sizes2 = shc.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    t("sizes2")(sizes2.count())
    val inter2 = shc.select(col("doc_id").as("id_a"), col("__sh"))
      .join(shc.select(col("doc_id").as("id_b"), col("__sh")), Seq("__sh"))
      .join(cands, Seq("id_a", "id_b"), "left_semi")
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    t("inter2")(inter2.count())
    t("verify jaccard (persisted cands)")(
      Dedup.jaccardForPairs(shP, "doc_id", cands).filter(col("jaccard") >= 0.5).count())
    println("sizes2 plan InMemory hits: " +
      sizes2.queryExecution.executedPlan.toString.linesIterator.count(_.contains("InMemory")))
    println(sizes2.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Scan") || l.contains("Exchange") || l.contains("Generate"))
      .mkString("\n"))
    spark.stop()
  }
}
