package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction for parquet directories — the standing
  * housekeeping job every incremental pipeline needs: streaming batches,
  * upserts and per-partition appends accumulate kilobyte files whose
  * per-file open/footer/task overhead eventually dominates scan cost (a
  * 100 TB table fragmented into 10⁷ × 10 MB files spends more time in
  * task scheduling and footer reads than in IO).
  *
  * Plan: first-fit-decreasing bin packing of data files into
  * `targetBytes` bins — FFD is within 11/9·OPT+1 of optimal (Johnson
  * 1973), and file COUNTS are small relative to data (planning is
  * driver-side metadata work, the same class as a Delta log replay).
  * Files already ≥ `targetBytes` are left alone; bins with a single
  * small file are left alone too (rewriting one file buys nothing).
  *
  * Execute: each multi-file bin is read and rewritten as ONE file into
  * the directory under a fresh `compact-*` name, THEN the originals are
  * deleted — so a crash mid-run leaves either the old files (new file
  * not yet visible under its final name) or both briefly; re-running
  * converges. Readers see duplicate rows only in the window between
  * publish and delete of one bin — callers needing stricter isolation
  * should compact behind a versioned-manifest table
  * ([[graft.sources.VersionedParquet]]), where the swap is one commit.
  * Row content is preserved exactly (read → write of the same rows, no
  * re-partitioning of values into different bins than planned).
  *
  * Concurrency: single compactor per directory; appends may overlap
  * (files created after the planning snapshot are simply missed by this
  * pass, never deleted) — full rules in PLANS.md "Store concurrency
  * contracts".
  */
object Compaction {

  /** FFD bins over the directory's parquet data files: only bins that
    * would merge ≥ 2 files are returned. */
  def plan(spark: SparkSession, dir: String, targetBytes: Long): Seq[Seq[String]] = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(root).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .filter(_.getLen < targetBytes)
      .sortBy(s => (-s.getLen, s.getPath.getName)) // FFD: biggest first, stable
    val bins = scala.collection.mutable.ArrayBuffer.empty[
      (scala.collection.mutable.ArrayBuffer[String], Long)]
    files.foreach { f =>
      bins.indexWhere(_._2 + f.getLen <= targetBytes) match {
        case -1 =>
          bins += ((scala.collection.mutable.ArrayBuffer(f.getPath.toString), f.getLen))
        case i =>
          bins(i) = ((bins(i)._1 += f.getPath.toString, bins(i)._2 + f.getLen))
      }
    }
    bins.toSeq.map(_._1.toSeq).filter(_.length >= 2)
  }

  /** Compact every multi-file bin; returns (bins_merged, files_removed,
    * files_added). Idempotent under re-run; see the class doc for the
    * crash/isolation contract. */
  def compact(spark: SparkSession, dir: String, targetBytes: Long): (Int, Int, Int) = {
    val bins = plan(spark, dir, targetBytes)
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    bins.zipWithIndex.foreach { case (bin, i) =>
      val staging = new Path(root, s".compact-staging-$i")
      spark.read.parquet(bin: _*).coalesce(1)
        .write.mode("overwrite").parquet(staging.toString)
      val part = fs.listStatus(staging).toSeq
        .map(_.getPath).find(_.getName.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(s"no output in $staging"))
      // publish the merged file, then retire the originals
      fs.rename(part, new Path(root, s"compact-$i-${part.getName}"))
      bin.foreach(f => fs.delete(new Path(f), false))
      fs.delete(staging, true)
    }
    (bins.length, bins.map(_.length).sum, bins.length)
  }

  /** [[compact]] over every leaf partition directory of a
    * hive-partitioned table (`root/cell=0/…`, `root/dt=…/hour=…/…`) —
    * the maintenance pass a per-partition APPEND path needs on a
    * cadence: each append ([[graft.x.Similarity.appendToIvfLayout]],
    * streaming micro-batches, upsert deltas) lands ≥ 1 small file in
    * every touched partition, so file counts grow linearly with batches
    * while file SIZES stay batch-sized — after 10⁴ ingest batches a
    * probe that prunes to 3 cells still opens 3×10⁴ footers. Compaction
    * happens strictly WITHIN each partition directory (bins never cross
    * partition values, so partition pruning and row content are
    * untouched); per-partition crash semantics are [[compact]]'s.
    * Returns summed (bins_merged, files_removed, files_added). */
  def compactPartitioned(spark: SparkSession, rootDir: String,
      targetBytes: Long): (Int, Int, Int) = {
    val root = new Path(rootDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def leafDirs(p: Path): Seq[Path] = {
      val subDirs = fs.listStatus(p).toSeq
        .filter(s => s.isDirectory && !s.getPath.getName.startsWith(".") &&
          !s.getPath.getName.startsWith("_"))
        .map(_.getPath)
      if (subDirs.isEmpty) Seq(p) else subDirs.flatMap(leafDirs)
    }
    leafDirs(root)
      .map(d => compact(spark, d.toString, targetBytes))
      .foldLeft((0, 0, 0)) { case ((a, b, c), (x, y, z)) =>
        (a + x, b + y, c + z)
      }
  }
}
