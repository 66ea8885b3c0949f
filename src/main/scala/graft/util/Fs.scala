package graft.util

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Closed-stream wrappers over `Files.list`/`Files.walk`. The raw NIO
  * streams hold a directory file descriptor until closed; call sites that
  * drop the stream (every `Files.list(...).iterator` pattern) leak one fd
  * per call, which accumulates in long-running pipelines that run SCD2
  * merges or versioned commits repeatedly (ADVICE r1). */
object Fs {
  def list(p: Path): Seq[Path] =
    if (!Files.exists(p)) Nil
    else { val s = Files.list(p); try s.iterator().asScala.toList finally s.close() }

  def walk(p: Path): Seq[Path] =
    if (!Files.exists(p)) Nil
    else { val s = Files.walk(p); try s.iterator().asScala.toList finally s.close() }

  def nonEmptyDir(p: Path): Boolean = list(p).nonEmpty

  /** Read a small marker file (watermarks, pointers) through the Hadoop
    * FileSystem COMPLETELY: `InputStream.read(buf)` may legally return a
    * prefix (real on S3A/HDFS streams), and a truncated watermark parses
    * as a LOWER batch id — which re-admits already-committed batches.
    * Loops to EOF; capped at 1 MiB because markers are tiny and a huge
    * "marker" is corruption worth failing on. */
  def readSmallFile(fs: org.apache.hadoop.fs.FileSystem,
      path: org.apache.hadoop.fs.Path): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    val in = fs.open(path)
    try {
      var n = in.read(buf)
      while (n >= 0) {
        out.write(buf, 0, n)
        require(out.size <= (1 << 20), s"$path exceeds the 1 MiB marker cap")
        n = in.read(buf)
      }
    } finally in.close()
    out.toByteArray
  }

  /** Stream every regular file under `dir` through a scratch buffer once:
    * pins the bytes in the OS page cache so timing runs (Bench, Explain,
    * ScaleProbe) measure compute, not the virtualized disk's cold-read
    * luck — this host intermittently drops the cache and a 1.5s query
    * reads as 90s+. No Spark-level caching involved. */
  def warmStorage(dir: String): Unit = {
    val buf = new Array[Byte](1 << 20)
    walk(java.nio.file.Paths.get(dir)).filter(Files.isRegularFile(_)).foreach { f =>
      val in = Files.newInputStream(f)
      try { while (in.read(buf) >= 0) () } finally in.close()
    }
  }
}
