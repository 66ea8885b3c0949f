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
  * the directory under a deterministic `compact-<binId>` name, THEN the
  * originals are deleted. Each bin's publish is fronted by a recovery
  * JOURNAL (`.compact-journal-<binId>`: the merged name + the source
  * list, written before any data moves), so a crash anywhere in the
  * window heals on the next run instead of compounding: journal present
  * + merged file present → the retire step is completed (sources
  * deleted); journal present + no merged file → the bin rolls back
  * (journal dropped, sources untouched). Without the journal a crash
  * between publish and retire would make the duplication PERMANENT —
  * the re-run would re-bin the merged file together with its surviving
  * sources and merge the same rows twice. The journal is staged
  * (temp-name write → hflush/hsync where the FS supports it → rename
  * into place) so an OS/power crash — not just a process crash — can't
  * leave a lost-or-truncated journal behind a publish rename that
  * survived the page cache; on local filesystems without durable sync
  * (e.g. Hadoop's ChecksumFileSystem ignores hsync) the journal is as
  * durable as the rename itself, which is the strongest guarantee that
  * FS offers any writer. The publish rename is
  * require-checked before any source delete (a failed rename must never
  * retire the rows it failed to publish). Readers see duplicate rows
  * only in the window between publish and delete of one bin — callers
  * needing stricter isolation should compact behind a versioned-manifest
  * table ([[graft.sources.VersionedParquet]]), where the swap is one
  * commit. Row content is preserved exactly (read → write of the same
  * rows, no re-partitioning of values into different bins than planned).
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

  /** Stable bin identity: the hash of the SORTED source-file list. Data
    * files are immutable (never rewritten in place), so the same id always
    * names the same merge — which is what lets a crashed bin's journal be
    * completed or rolled back unambiguously on the next run. */
  private[graft] def binId(sources: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    sources.sorted.foreach(s => md.update((s + "\n").getBytes("UTF-8")))
    md.digest().take(8).map(b => f"$b%02x").mkString
  }

  private[graft] def mergedName(id: String): String = s"compact-$id.parquet"

  private[graft] def journalName(id: String): String = s".compact-journal-$id"

  /** Heal any bin a previous run crashed inside (see the class doc):
    * complete the retire step when the merged file was published, roll the
    * bin back when it was not, and drop stale staging dirs either way.
    * A partially-written journal can only belong to an unpublished bin
    * (the journal is closed before any data moves), so a truncated source
    * list is always the rollback case — nothing is deleted on bad parse. */
  private def recover(fs: org.apache.hadoop.fs.FileSystem, root: Path): Unit = {
    val entries = fs.listStatus(root).toSeq
    // an orphaned temp journal means the bin never started (the rename
    // into the journal name precedes any data movement) — just drop it
    entries.filter(s => s.isFile && s.getPath.getName.startsWith(".compact-journal-")
        && s.getPath.getName.endsWith(".tmp"))
      .foreach(s => fs.delete(s.getPath, false))
    entries.filter(s => s.isFile && s.getPath.getName.startsWith(".compact-journal-")
        && !s.getPath.getName.endsWith(".tmp"))
      .foreach { j =>
        // not readSmallFile: its 1 MiB corruption cap could wedge the
        // recovery of a legitimately huge bin's source list
        val in = fs.open(j.getPath)
        val bytes =
          try {
            val out = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](8192)
            var n = in.read(buf)
            while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
            out.toByteArray
          } finally in.close()
        val lines = new String(bytes, "UTF-8").split("\n").toSeq.filter(_.nonEmpty)
        val published = lines.headOption.exists(m => fs.exists(new Path(root, m)))
        if (published) lines.drop(1).foreach(s => fs.delete(new Path(s), false))
        fs.delete(j.getPath, false)
      }
    entries.filter(s => s.isDirectory && s.getPath.getName.startsWith(".compact-staging-"))
      .foreach(s => fs.delete(s.getPath, true))
  }

  /** Compact every multi-file bin; returns (bins_merged, files_removed,
    * files_added). Idempotent under re-run — including re-runs after a
    * crash anywhere in a bin's publish window (journal recovery runs
    * first); see the class doc for the crash/isolation contract. */
  def compact(spark: SparkSession, dir: String, targetBytes: Long): (Int, Int, Int) = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root)) recover(fs, root)
    val bins = plan(spark, dir, targetBytes)
    bins.foreach { bin =>
      val id = binId(bin)
      // journal first: after this point a crash is recoverable either
      // way. Staged temp → hflush/hsync → rename, so the journal's bytes
      // can't be lost from the page cache by an OS crash while the later
      // publish rename survives (which would re-bin merged + surviving
      // sources and make the duplication permanent — the exact failure
      // the journal exists to prevent).
      val journal = new Path(root, journalName(id))
      val journalTmp = new Path(root, journalName(id) + ".tmp")
      val out = fs.create(journalTmp, true)
      try {
        out.write((mergedName(id) +: bin).mkString("\n").getBytes("UTF-8"))
        out.hflush()
        try out.hsync()
        catch { case _: UnsupportedOperationException => () } // local FS: rename is the fsync
      } finally out.close()
      require(fs.rename(journalTmp, journal),
        s"compaction journal rename failed: $journalTmp -> $journal")
      val staging = new Path(root, s".compact-staging-$id")
      spark.read.parquet(bin: _*).coalesce(1)
        .write.mode("overwrite").parquet(staging.toString)
      val part = fs.listStatus(staging).toSeq
        .map(_.getPath).find(_.getName.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(s"no output in $staging"))
      // publish the merged file (MUST succeed before any source is
      // retired — an unchecked failed rename here would delete rows that
      // were never republished), then retire the originals
      val target = new Path(root, mergedName(id))
      require(fs.rename(part, target),
        s"compaction publish rename failed: $part -> $target")
      bin.foreach(f => fs.delete(new Path(f), false))
      fs.delete(journal, false)
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
